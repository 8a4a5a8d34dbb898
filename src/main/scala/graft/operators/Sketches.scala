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
}
