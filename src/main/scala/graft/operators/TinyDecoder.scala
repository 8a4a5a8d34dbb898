package graft.operators

import org.apache.spark.sql.Dataset

/** Pure-Scala port of the reference's Presto MAE decoder
  * (presto-tolbi/presto/presto.py:425-618) completing the
  * pretraining objective that [[TinyEncoder]] starts: the encoder
  * sees only the unmasked timesteps; the decoder linearly re-embeds
  * those token states, re-inserts a mask token at every masked
  * position (`add_masked_tokens`, presto.py:505-520), adds
  * positional + cyclic-month embeddings (`add_embeddings`,
  * presto.py:522-568), runs the same pre-LN transformer stack over
  * the now-complete sequence, and reconstructs the input bands
  * through per-band-group linear heads (`reconstruct_inputs`,
  * presto.py:570-611). Mirrors the reference decoder defaults:
  * embed dim 128, depth 2, 8 heads, mlp ratio 2 (presto.py:427-434).
  *
  * Like the encoder, weights are deterministic functions of a seed
  * (the mask token keeps the reference's zero init), inference is
  * sequential per-row double arithmetic inside `mapPartitions`, and
  * results are partition-count-independent and bit-reproducible.
  */
object TinyDecoder {

  import TinyEncoder.{D, NumTimesteps, NumBands, Block, matVec, layerNorm, mat}

  val Depth = 2        // decoder_depth (presto.py:430)
  val MlpHidden = 256  // mlp_ratio 2 over embed dim 128 (presto.py:432)

  /** Band-group partition of the 17-band token, in band order — each
    * group gets its own reconstruction head, concatenated in order
    * exactly as the reference's ordered BANDS_GROUPS_IDX heads
    * (presto.py:465-470, 606-611). */
  val BandGroups: Seq[(String, Range)] = Seq(
    "S1" -> (0 until 2), "S2_RGB" -> (2 until 5), "S2_RE" -> (5 until 8),
    "S2_NIR" -> (8 until 10), "S2_SWIR" -> (10 until 12),
    "ERA5" -> (12 until 14), "SRTM" -> (14 until 16), "NDVI" -> (16 until 17))

  /** The NIR slot carrying the single-band pretraining series (B8 in
    * the reference's band order, s1_s2_era5_srtm.py:94). */
  val B8Band = 8

  final case class DecWeights(
    wEmbed: Array[Array[Double]], bEmbed: Array[Double],
    maskToken: Array[Double],
    pos: Array[Array[Double]], monthTab: Array[Array[Double]],
    blocks: Array[Block], lnFg: Array[Double], lnFb: Array[Double],
    heads: Array[(Array[Array[Double]], Array[Double])])

  def init(seed: Long): DecWeights = {
    val rng = new java.util.Random(seed)
    // sinusoidal position table (get_sinusoid_encoding_table, shared
    // form with the encoder) and the cyclic month table
    // (get_month_encoding_table: period-12 sin/cos pairs)
    val pos = Array.tabulate(NumTimesteps, D) { (p, i) =>
      val angle = p / math.pow(10000.0, 2.0 * (i / 2) / D)
      if (i % 2 == 0) math.sin(angle) else math.cos(angle)
    }
    // get_month_encoding_table's exact layout: ONE frequency (2π/12)
    // for every dim, first half all sin(2π·m/12), second half all
    // cos(2π·m/12) — sin block ‖ cos block, not interleaved pairs
    val monthTab = Array.tabulate(12, D) { (m, i) =>
      val angle = 2.0 * math.Pi * m / 12.0
      if (i < D / 2) math.sin(angle) else math.cos(angle)
    }
    val blocks = Array.fill(Depth)(Block(
      Array.fill(D)(1.0), Array.fill(D)(0.0),
      mat(rng, D, D), mat(rng, D, D), mat(rng, D, D), mat(rng, D, D),
      Array.fill(D)(1.0), Array.fill(D)(0.0),
      mat(rng, D, MlpHidden), Array.fill(MlpHidden)(0.0),
      mat(rng, MlpHidden, D), Array.fill(D)(0.0)))
    val heads = BandGroups.map { case (_, r) =>
      (mat(rng, D, r.size), Array.fill(r.size)(0.0))
    }.toArray
    DecWeights(
      mat(rng, D, D), Array.fill(D)(0.0),
      Array.fill(D)(0.0), // mask token: zero init like the reference's nn.Parameter(zeros)
      pos, monthTab, blocks,
      Array.fill(D)(1.0), Array.fill(D)(0.0),
      heads)
  }

  /** Decode: encoder states of the UNMASKED timesteps (in original
    * time order) + the mask + the window start month → the full
    * NumTimesteps × NumBands reconstruction. */
  def decode(dw: DecWeights, encTokens: Array[Array[Double]],
      mask: Array[Boolean], startMonth: Int): Array[Array[Double]] = {
    require(encTokens.length == mask.count(!_),
      "one encoder token per unmasked timestep expected")
    var ei = 0
    val h0 = Array.tabulate(NumTimesteps) { t =>
      val base =
        if (mask(t)) dw.maskToken.clone()
        else {
          val e = matVec(dw.wEmbed, encTokens(ei)); ei += 1
          var i = 0
          while (i < D) { e(i) += dw.bEmbed(i); i += 1 }
          e
        }
      val m = (t + startMonth) % 12
      Array.tabulate(D)(i => base(i) + dw.pos(t)(i) + dw.monthTab(m)(i))
    }
    val h = TinyEncoder.runBlocks(dw.blocks, h0, Array.fill(NumTimesteps)(true))
    h.map { tok =>
      val normed = layerNorm(tok, dw.lnFg, dw.lnFb)
      val out = new Array[Double](NumBands)
      var g = 0
      while (g < BandGroups.length) {
        val (w, b) = dw.heads(g)
        val r = BandGroups(g)._2
        val pred = matVec(w, normed)
        var j = 0
        for (band <- r) { out(band) = pred(j) + b(j); j += 1 }
        g += 1
      }
      out
    }
  }

  /** One masked pretraining example (PretrainingTable row shape):
    * xEo = masked normalized series (0 at masked slots), yEo =
    * reconstruction targets (0 at unmasked slots), mask = which
    * slots were hidden from the encoder. */
  final case class MaskedExample(id: String, xEo: Seq[Double],
      mask: Seq[Boolean], yEo: Seq[Double], startMonth: Int)

  final case class MaeRow(id: String, n_masked: Int, masked_mse: Double,
      recon_masked: Seq[Double])

  /** The full MAE path encode→decode over masked examples as a
    * mapPartitions operator: per partition one encoder + decoder
    * weight set, per row the unmasked timesteps are encoded, the
    * decoder re-inserts mask tokens and predicts every band, and the
    * masked-slot predictions are scored against the held-out targets
    * (the reference training loss's per-example term,
    * Presto.forward presto.py:744-761). Rows with every timestep
    * masked (no encoder input) are dropped, as in the reference's
    * collate filter. */
  def reconstruct(ds: Dataset[MaskedExample], seed: Long = 42L): Dataset[MaeRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val ew = TinyEncoder.init(seed)
      val dw = init(seed + 1)
      it.flatMap { ex =>
        val mask = ex.mask.toArray
        val valid = mask.map(!_)
        if (!valid.exists(identity)) None
        else {
          val x = Array.tabulate(NumTimesteps, NumBands)((t, b) =>
            if (b == B8Band) ex.xEo(t).toFloat else 0f)
          val tokens = TinyEncoder.encodeTokens(ew, x, valid)
          val encValid = (0 until NumTimesteps).filter(valid).map(tokens(_)).toArray
          val recon = decode(dw, encValid, mask, ex.startMonth)
          val maskedIdx = (0 until NumTimesteps).filter(mask)
          val preds = maskedIdx.map(t => recon(t)(B8Band))
          val mse =
            if (maskedIdx.isEmpty) 0.0
            else maskedIdx.map(t => {
              val e = recon(t)(B8Band) - ex.yEo(t); e * e
            }).sum / maskedIdx.size
          Some(MaeRow(ex.id, maskedIdx.size, mse, preds))
        }
      }
    }
  }
}
