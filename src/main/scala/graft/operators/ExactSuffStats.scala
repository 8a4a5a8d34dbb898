package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class SuffStatsBuf(n: Long, sum2: Long, sumsq4: Long)
case class SuffStatsResult(n: Long, mean: Double, variance: Double)

/** Typed single-pass sufficient-statistics aggregator
  * (`Aggregator[IN, BUF, OUT]`, SURVEY §7.2) — the reference
  * accumulates per-band Σx/Σx²/n across files in one pass
  * (src/utils.py:12-49); this is the same algebra as a distributed
  * monoid: `reduce` on executors, `merge` across partitions, one
  * shuffle total.
  *
  * Exactness: inputs are 2-decimal doubles, so `round(x*100)` is an
  * exact integer; the buffer is pure integer arithmetic —
  * order-independent and overflow-safe to ~10^14 rows — and the final
  * mean/variance are a fixed sequence of IEEE ops, reproducible on
  * any partitioning and matching the DuckDB oracle bit-for-bit.
  */
object ExactSuffStats extends Aggregator[Double, SuffStatsBuf, SuffStatsResult] {
  override def zero: SuffStatsBuf = SuffStatsBuf(0L, 0L, 0L)

  override def reduce(b: SuffStatsBuf, x: Double): SuffStatsBuf = {
    val c = math.round(x * 100.0)
    SuffStatsBuf(b.n + 1, b.sum2 + c, b.sumsq4 + c * c)
  }

  override def merge(a: SuffStatsBuf, b: SuffStatsBuf): SuffStatsBuf =
    SuffStatsBuf(a.n + b.n, a.sum2 + b.sum2, a.sumsq4 + b.sumsq4)

  override def finish(b: SuffStatsBuf): SuffStatsResult = {
    val mean = b.sum2.toDouble / 100.0 / b.n
    val variance = b.sumsq4.toDouble / 10000.0 / b.n - mean * mean
    SuffStatsResult(b.n, mean, variance)
  }

  override def bufferEncoder: Encoder[SuffStatsBuf] = Encoders.product
  override def outputEncoder: Encoder[SuffStatsResult] = Encoders.product
}
