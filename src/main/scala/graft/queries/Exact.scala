package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent floating-point aggregation.
  *
  * Summing doubles is order-dependent, and Spark's shuffle order differs
  * from DuckDB's scan order, so a plain `sum(double)` can differ from the
  * oracle in the last ulps and fail the hash compare. Accumulating in
  * decimal is exact (addition is associative), so the final
  * decimal→double cast yields bit-identical results on both engines.
  * The same trick keeps window running-sums and sufficient-statistics
  * reproducible under any partitioning — which is exactly what a
  * 1000-executor cluster needs for deterministic results.
  */
object Exact {
  val Dec = DecimalType(25, 6)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** SQL text of the same computation for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(25,6))) AS DOUBLE)"

  /** Exact mean: exact double sum divided by count (one IEEE division,
    * identical on both engines). */
  def dmean(c: Column): Column = dsum(c) / count(c)

  def dmeanSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"

  /** Exact mean of a COMPUTED double expression.
    *
    * The decimal-cast trick above is only safe for doubles that are
    * already round decimals (raw data columns): for computed values the
    * double→decimal cast itself rounds, and Spark and DuckDB round
    * half-way cases differently. Quantizing with floor instead is
    * deterministic — `floor(x*1e6)` of the same IEEE double is the same
    * integer on every engine — and the integer sum is exact. Semantics:
    * mean of values truncated to 1e-6.
    */
  def qmean(c: Column): Column =
    sum(floor(c * lit(1000000.0)).cast("long")).cast("double") /
      lit(1000000.0) / count(c)

  def qmeanSql(expr: String): String =
    s"(CAST(SUM(CAST(FLOOR(($expr) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT($expr))"

  /** Exact sum of a COMPUTED double expression — same floor
    * quantization as [[qmean]], without the division. Semantics: sum
    * of values truncated to 1e-6. */
  def qsum(c: Column): Column =
    sum(floor(c * lit(1000000.0)).cast("long")).cast("double") / lit(1000000.0)

  def qsumSql(expr: String): String =
    s"(CAST(SUM(CAST(FLOOR(($expr) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0)"
}
