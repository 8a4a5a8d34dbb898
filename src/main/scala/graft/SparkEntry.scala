package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every implemented
  * operator from SURVEY.md §2 has an entry in [[queries]]; where the
  * semantics are ANSI-SQL-expressible the matching DuckDB oracle text
  * is in [[oracleSql]] (same column names — the driver's compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracle),
      (TimeSeriesQueries.queries, TimeSeriesQueries.oracle),
      (ScalarFuncQueries.queries, ScalarFuncQueries.oracle),
      (TextQueries.queries, TextQueries.oracle),
      (VectorQueries.queries, VectorQueries.oracle),
      (PipelineQueries.queries, PipelineQueries.oracle),
      (MultimodalQueries.queries, MultimodalQueries.oracle),
      (MlQueries.queries, MlQueries.oracle),
      (RasterQueries.queries, RasterQueries.oracle),
      (OlapExtraQueries.queries, OlapExtraQueries.oracle),
      (EncoderQueries.queries, EncoderQueries.oracle),
      (StatQueries.queries, StatQueries.oracle),
      (RetrievalQueries.queries, RetrievalQueries.oracle),
      (AnalyticsQueries.queries, AnalyticsQueries.oracle),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's core pipeline shape (monthly.py:722-735): monthly
    * median composite per entity + a normalized-difference index over
    * two composite bands — here the events table stands in for the
    * observations table (SURVEY §1.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val monthly = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(
        percentile(col("value"), lit(0.5)).as("median_value"),
        Exact.dmean(col("value")).as("mean_value"),
        count(lit(1)).as("n_obs"))
    // normalized difference of the two composites — NDVI shape
    // (common_ci.py:89-100) with divide-by-zero guard (eesrtm.py:151-162)
    monthly.withColumn("nd_index",
      when(col("median_value") + col("mean_value") =!= 0,
        (col("median_value") - col("mean_value")) /
        (col("median_value") + col("mean_value"))).otherwise(lit(0.0)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = modules.map(_._1).reduce(_ ++ _)
    // a name collision across modules would silently drop a query
    require(merged.size == modules.map(_._1.size).sum,
      s"duplicate query names across modules: ${
        modules.flatMap(_._1.keys).groupBy(identity)
          .collect { case (k, vs) if vs.size > 1 => k }.mkString(", ")}")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
