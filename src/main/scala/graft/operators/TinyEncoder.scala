package graft.operators

import org.apache.spark.sql.Dataset

/** Pure-Scala port of the reference's Presto encoder shape
  * (presto-tolbi/presto/presto.py:218-422: per-timestep tokens +
  * sinusoidal position encodings, depth-2 pre-LN multi-head
  * self-attention with GELU MLP, masked mean pooling →
  * fixed-dimension embedding) as a "model-as-function" operator
  * (SURVEY §2.9 transformer row, §7.3 hard-part 4): inference runs as
  * batched `mapPartitions` linear algebra, embeddings land in an
  * `ArrayType(FloatType)` column that feeds the vector operators
  * (cosine top-k, LSH, probes).
  *
  * Weights are deterministic functions of a seed (java.util.Random is
  * spec-fixed, so every executor materializes identical weights — no
  * broadcast of a 1–2 MB blob needed, though at 100 TB you would
  * broadcast a real checkpoint instead). All math is sequential
  * per-row double arithmetic: partition-count-independent and
  * bit-reproducible.
  */
object TinyEncoder {

  val NumTimesteps = 12 // monthly series (s1_s2_era5_srtm.py:89)
  val NumBands = 17     // normalized band count (s1_s2_era5_srtm.py:94)
  val D = 128           // embedding width (presto.py:763-776)
  val Heads = 8
  val Depth = 2
  val MlpHidden = 256   // mlp_ratio 2 (presto.py:228)
  private val Dh = D / Heads

  final case class Block(
    ln1g: Array[Double], ln1b: Array[Double],
    wq: Array[Array[Double]], wk: Array[Array[Double]],
    wv: Array[Array[Double]], wo: Array[Array[Double]],
    ln2g: Array[Double], ln2b: Array[Double],
    w1: Array[Array[Double]], b1: Array[Double],
    w2: Array[Array[Double]], b2: Array[Double])

  final case class Weights(wIn: Array[Array[Double]], bIn: Array[Double],
                           pos: Array[Array[Double]], blocks: Array[Block],
                           lnFg: Array[Double], lnFb: Array[Double])

  /** Deterministic dense init: scaled uniform from a seeded RNG per
    * matrix — identical on every JVM. */
  private[operators] def mat(rng: java.util.Random, rows: Int, cols: Int): Array[Array[Double]] = {
    val s = math.sqrt(6.0 / (rows + cols))
    Array.fill(rows)(Array.fill(cols)((rng.nextDouble() * 2 - 1) * s))
  }

  def init(seed: Long): Weights = {
    val rng = new java.util.Random(seed)
    // sinusoidal month/position table (presto.py:161-194)
    val pos = Array.tabulate(NumTimesteps, D) { (p, i) =>
      val angle = p / math.pow(10000.0, 2.0 * (i / 2) / D)
      if (i % 2 == 0) math.sin(angle) else math.cos(angle)
    }
    val blocks = Array.fill(Depth)(Block(
      Array.fill(D)(1.0), Array.fill(D)(0.0),
      mat(rng, D, D), mat(rng, D, D), mat(rng, D, D), mat(rng, D, D),
      Array.fill(D)(1.0), Array.fill(D)(0.0),
      mat(rng, D, MlpHidden), Array.fill(MlpHidden)(0.0),
      mat(rng, MlpHidden, D), Array.fill(D)(0.0)))
    Weights(mat(rng, NumBands, D), Array.fill(D)(0.0), pos, blocks,
      Array.fill(D)(1.0), Array.fill(D)(0.0))
  }

  private[operators] def layerNorm(x: Array[Double], g: Array[Double], b: Array[Double]): Array[Double] = {
    val n = x.length
    var mean = 0.0; var i = 0
    while (i < n) { mean += x(i); i += 1 }
    mean /= n
    var v = 0.0; i = 0
    while (i < n) { val d = x(i) - mean; v += d * d; i += 1 }
    val inv = 1.0 / math.sqrt(v / n + 1e-6)
    Array.tabulate(n)(j => (x(j) - mean) * inv * g(j) + b(j))
  }

  private[operators] def matVec(w: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](w(0).length)
    var i = 0
    while (i < x.length) {
      val xi = x(i); val row = w(i)
      var j = 0
      while (j < row.length) { out(j) += xi * row(j); j += 1 }
      i += 1
    }
    out
  }

  private def gelu(x: Double): Double =
    0.5 * x * (1.0 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))

  /** Pre-LN transformer stack over a token sequence with a validity
    * mask: invalid tokens are excluded from attention (as keys AND
    * queries) and skipped by the MLP residual, so valid tokens' final
    * states equal what they would be had the invalid tokens never
    * been in the sequence — the property the MAE decoder relies on
    * when it re-inserts mask tokens (presto.py:505-520). Shared by
    * encoder and decoder (the decoder runs it with all-valid). */
  private[operators] def runBlocks(blocks: Array[Block],
      h0: Array[Array[Double]], valid: Array[Boolean]): Array[Array[Double]] = {
    val n = h0.length
    var h = h0
    for (blk <- blocks) {
      // pre-LN attention with mask
      val normed = h.map(layerNorm(_, blk.ln1g, blk.ln1b))
      val q = normed.map(matVec(blk.wq, _))
      val k = normed.map(matVec(blk.wk, _))
      val v = normed.map(matVec(blk.wv, _))
      val attnOut = Array.tabulate(n) { t =>
        if (!valid(t)) new Array[Double](D)
        else {
          val merged = new Array[Double](D)
          var head = 0
          while (head < Heads) {
            val off = head * Dh
            // scores over valid keys only
            val scores = Array.tabulate(n) { s =>
              if (!valid(s)) Double.NegativeInfinity
              else {
                var dot = 0.0; var d = 0
                while (d < Dh) { dot += q(t)(off + d) * k(s)(off + d); d += 1 }
                dot / math.sqrt(Dh.toDouble)
              }
            }
            val mx = scores.max
            val exps = scores.map(s => if (s == Double.NegativeInfinity) 0.0 else math.exp(s - mx))
            val z = exps.sum
            var s = 0
            while (s < n) {
              val a = exps(s) / z
              if (a != 0.0) {
                var d = 0
                while (d < Dh) { merged(off + d) += a * v(s)(off + d); d += 1 }
              }
              s += 1
            }
            head += 1
          }
          matVec(blk.wo, merged)
        }
      }
      h = Array.tabulate(n)(t =>
        Array.tabulate(D)(i => h(t)(i) + attnOut(t)(i)))
      // pre-LN MLP
      val normed2 = h.map(layerNorm(_, blk.ln2g, blk.ln2b))
      val mlpOut = normed2.map { nx =>
        val hid = matVec(blk.w1, nx)
        var i = 0
        while (i < hid.length) { hid(i) = gelu(hid(i) + blk.b1(i)); i += 1 }
        val out = matVec(blk.w2, hid)
        var j = 0
        while (j < out.length) { out(j) += blk.b2(j); j += 1 }
        out
      }
      h = Array.tabulate(n)(t =>
        Array.tabulate(D)(i => h(t)(i) + (if (valid(t)) mlpOut(t)(i) else 0.0)))
    }
    h
  }

  /** Per-token encoder states (no pooling) — what the MAE decoder
    * consumes: the reference encoder returns the token sequence when
    * not pooling for an eval task (presto.py:418-422). */
  def encodeTokens(w: Weights, x: Array[Array[Float]], valid: Array[Boolean]): Array[Array[Double]] = {
    // tokenize: W_in · bands + positional encoding
    val h0: Array[Array[Double]] = Array.tabulate(NumTimesteps) { t =>
      val xd = Array.tabulate(NumBands)(b => x(t)(b).toDouble)
      val tok = matVec(w.wIn, xd) // (NumBands × D) rows indexed by band
      Array.tabulate(D)(i => tok(i) + w.bIn(i) + w.pos(t)(i))
    }
    runBlocks(w.blocks, h0, valid)
  }

  /** Encode one pixel time-series (NumTimesteps × NumBands, row-major)
    * with a per-timestep validity mask → D-dim embedding. Masked
    * timesteps are excluded from attention and pooling (presto.py:
    * 328-422 masked attention + 417-418 masked mean). */
  def encode(w: Weights, x: Array[Array[Float]], valid: Array[Boolean]): Array[Float] = {
    val keep = valid.count(identity)
    require(keep > 0, "at least one unmasked timestep required")
    val h = encodeTokens(w, x, valid)
    // masked mean pool over valid tokens, final LN
    val pooled = new Array[Double](D)
    var t = 0
    while (t < NumTimesteps) {
      if (valid(t)) { var i = 0; while (i < D) { pooled(i) += h(t)(i); i += 1 } }
      t += 1
    }
    var i = 0
    while (i < D) { pooled(i) /= keep; i += 1 }
    layerNorm(pooled, w.lnFg, w.lnFb).map(_.toFloat)
  }

  final case class PixelSeries(id: Long, series: Seq[Seq[Float]], valid: Seq[Boolean])
  final case class PixelEmbedding(id: Long, embedding: Seq[Float])

  /** Column-level inference: one weights instance per partition,
    * sequential batch over rows — the mapPartitions "model as
    * function" surface (SURVEY §2.11 last row). */
  def embed(ds: Dataset[PixelSeries], seed: Long = 42L): Dataset[PixelEmbedding] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val w = init(seed)
      it.map { p =>
        val x = p.series.map(_.toArray).toArray
        PixelEmbedding(p.id, encode(w, x, p.valid.toArray).toSeq)
      }
    }
  }
}
