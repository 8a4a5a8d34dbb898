package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The approximate tier (SURVEY §2.4 distinct row, §2.11 custom
  * aggregates): at 100 TB, exact COUNT(DISTINCT) and exact
  * percentiles are a full extra shuffle of distinct values per group;
  * the sketch forms are single-pass, bounded-memory, and mergeable
  * across partitions. Declared queries keep the exact forms (the
  * DuckDB oracle requires determinism); pipelines switch to these
  * at scale. Specs bound the approximation error against the exact
  * answers. */
object Sketches {

  /** HyperLogLog++ distinct count, default 5 % relative error. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** KLL-style quantile sketch: percentile_approx with an accuracy
    * knob (higher = tighter, more memory). */
  def approxQuantile(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))

  /** Per-group exact vs approx side-by-side — the calibration frame a
    * pipeline uses to pick accuracy knobs. */
  def calibrate(df: DataFrame, groupCol: String, valueCol: String,
                distinctCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      countDistinct(col(distinctCol)).as("exact_distinct"),
      approxDistinct(col(distinctCol)).as("approx_distinct"),
      percentile(col(valueCol), lit(0.5)).as("exact_p50"),
      approxQuantile(col(valueCol), 0.5).as("approx_p50"))

  /** Misra–Gries heavy-hitters summary: at most `k` counters, and
    * after any sequence of adds and MERGES (Agarwal et al.,
    * "Mergeable Summaries", PODS'12) every item with true frequency
    * > n/(k+1) is present, with estimate undercounting by at most
    * the total decrement — bounded by n/(k+1). The frequency analog
    * of the HLL/KLL tier above: single-pass, bounded-memory,
    * partition-mergeable, the shape that replaces an exact
    * (token → count) shuffle when only the hot tail matters at
    * 100 TB (hot-token tracking, stop-list induction, skew-key
    * detection for salting). The summary CONTENT is
    * order-dependent for borderline items — only the guarantees
    * above are deterministic, which is exactly what
    * q_heavy_hitters grades. */
  /** MG shrink step, shared by the batch Aggregator and the streaming
    * state op: subtract the (k+1)-th largest count from every counter
    * and drop the non-positive — one decrement round charges at most
    * `cut` to the global error budget (total decrements ≤ n/(k+1)). */
  private[graft] def mgShrink(m: scala.collection.mutable.Map[String, Long],
      k: Int): scala.collection.mutable.Map[String, Long] = {
    if (m.size <= k) return m
    val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
    val out = scala.collection.mutable.Map.empty[String, Long]
    for ((t, c) <- m; d = c - cut; if d > 0) out(t) = d
    out
  }

  class MisraGries(k: Int) extends org.apache.spark.sql.expressions.Aggregator[
      String, scala.collection.mutable.Map[String, Long], Map[String, Long]] {
    import scala.collection.mutable
    def zero: mutable.Map[String, Long] = mutable.Map.empty

    def reduce(b: mutable.Map[String, Long], tok: String): mutable.Map[String, Long] = {
      b(tok) = b.getOrElse(tok, 0L) + 1L
      if (b.size > k) mgShrink(b, k) else b
    }

    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      for ((t, c) <- small) big(t) = big.getOrElse(t, 0L) + c
      mgShrink(big, k)
    }

    def finish(r: mutable.Map[String, Long]): Map[String, Long] = r.toMap
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder = org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
  }

  /** Count–min sketch (Cormode–Muthukrishnan, J.Alg 2005): a d×w
    * counter matrix; add(x) increments cell (i, hᵢ(x)) in each of the
    * d rows; estimate(x) = minᵢ cell(i, hᵢ(x)). The complement of
    * [[MisraGries]] in the frequency tier: MG undercounts (tracked
    * items only), CMS OVERcounts (every item answerable) — est ≥
    * true always (counters only increase: the deterministic
    * guarantee), and est ≤ true + (e/w)·N with probability
    * ≥ 1 − e^(−d) per query (the ε–δ analysis).
    *
    * Unlike MG, the sketch is LINEAR: merge is cell-wise addition,
    * so the matrix CONTENT — not just its guarantees — is identical
    * under any partitioning/merge order. d·w longs of state
    * (knob-bounded, like the IVF header) replace an exact
    * (token → count) shuffle at 100 TB; the per-row hash is
    * MurmurHash3 with a per-row seed, evaluated executor-side. */
  class CountMin(d: Int, w: Int) extends org.apache.spark.sql.expressions.Aggregator[
      String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], x: String): Array[Long] = {
      var i = 0
      while (i < d) { b(Sketches.cmCell(i, w, x)) += 1L; i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
  }

  /** Row-i cell index for item x in a width-w CMS row (flat d×w
    * layout). Seeded MurmurHash3 — deterministic across JVMs. */
  private[graft] def cmCell(i: Int, w: Int, x: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(x, 0x9e3779b9 * (i + 1))
    i * w + java.lang.Math.floorMod(h, w)
  }

  /** Point estimate from a finished CMS array: min over the d rows. */
  def cmEstimate(sk: Array[Long], d: Int, w: Int, x: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) { best = math.min(best, sk(cmCell(i, w, x))); i += 1 }
    best
  }
}
