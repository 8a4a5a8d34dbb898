package graft

import graft.operators.TinyEncoder
import graft.operators.TinyEncoder.{PixelSeries, encode, init}

class TinyEncoderSpec extends SparkSpec {

  private def series(seed: Int): Array[Array[Float]] =
    Array.tabulate(TinyEncoder.NumTimesteps, TinyEncoder.NumBands)(
      (t, b) => ((seed + t * 31 + b * 7) % 97) / 97.0f)

  private val allValid = Array.fill(TinyEncoder.NumTimesteps)(true)

  test("encode emits D-dim embeddings deterministically") {
    val w = init(42L)
    val a = encode(w, series(1), allValid)
    val b = encode(w, series(1), allValid)
    assert(a.length == TinyEncoder.D)
    assert(a.toSeq == b.toSeq)
    // different input → different embedding
    assert(encode(w, series(2), allValid).toSeq != a.toSeq)
    // different weights seed → different embedding
    assert(encode(init(7L), series(1), allValid).toSeq != a.toSeq)
  }

  test("masked timesteps cannot influence the embedding") {
    val w = init(42L)
    val valid = allValid.clone(); valid(3) = false; valid(9) = false
    val x1 = series(1)
    val x2 = series(1).map(_.clone())
    // perturb ONLY the masked timesteps
    x2(3).indices.foreach(i => x2(3)(i) = 999.0f)
    x2(9).indices.foreach(i => x2(9)(i) = -999.0f)
    assert(encode(w, x1, valid).toSeq == encode(w, x2, valid).toSeq)
    // but perturbing an unmasked timestep changes it
    val x3 = series(1).map(_.clone()); x3(0)(0) = 999.0f
    assert(encode(w, x3, valid).toSeq != encode(w, x1, valid).toSeq)
  }

  test("embed is partition-count independent over a Dataset") {
    import spark.implicits._
    val rows = (1L to 40L).map(i =>
      PixelSeries(i, series(i.toInt).map(_.toSeq).toSeq,
        allValid.toSeq.updated((i % 12).toInt, false)))
    val one = TinyEncoder.embed(rows.toDS().repartition(1)).collect().sortBy(_.id).toSeq
    val many = TinyEncoder.embed(rows.toDS().repartition(7)).collect().sortBy(_.id).toSeq
    assert(one == many)
    assert(one.forall(_.embedding.length == TinyEncoder.D))
  }
}
