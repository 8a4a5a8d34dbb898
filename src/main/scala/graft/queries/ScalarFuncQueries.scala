package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VegIndices
import graft.queries.Exact._

/** Scalar-function surface: the 17-index vegetation library plus
  * string/date function coverage (SURVEY §2.8).
  */
object ScalarFuncQueries {

  /** Synthetic "bands" over lineitem numeric columns — strictly
    * positive so index denominators behave like reflectances. */
  private val bands: Map[String, String] = Map(
    "blue" -> "l_quantity",
    "green" -> "l_extendedprice / 1000",
    "red" -> "l_discount * 100 + 1",
    "redEdge" -> "l_tax * 100 + 1",
    "nir" -> "l_quantity + l_linenumber",
    "swir1" -> "l_linenumber * 10",
    "swir2" -> "(l_suppkey % 50) + 1",
  )

  private val indexFormulas: Seq[(String, String)] =
    VegIndices.formulas(bands("blue"), bands("green"), bands("red"),
      bands("redEdge"), bands("nir"), bands("swir1"), bands("swir2"))

  /** All 17 vegetation indices computed per row (codegen'd
    * expressions, common_ci.py:87-180), then averaged per return flag
    * — the per-pixel index + temporal composite shape. */
  def qVegIndices(spark: SparkSession, dir: String): DataFrame = {
    val withIdx = Tables.lineitem(spark, dir)
      .select(col("l_returnflag") +: indexFormulas.map { case (n, f) => expr(f).as(n) }: _*)
    withIdx.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        indexFormulas.map { case (n, _) => qmean(col(n)).as(s"avg_$n") }: _*)
  }

  val qVegIndicesSql: String = {
    val aggs = indexFormulas
      .map { case (n, f) => s"  ${qmeanSql(f)} AS avg_$n" }
      .mkString(",\n")
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |$aggs
       |FROM lineitem GROUP BY l_returnflag""".stripMargin
  }

  /** Per-row index evaluation on a subset — proves the scalar
    * expressions produce bit-identical IEEE doubles on both engines
    * (no aggregation, no quantization). */
  def qVegIndicesRows(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 500)
      .select(Seq(col("l_orderkey"), col("l_linenumber")) ++
        indexFormulas.map { case (n, f) => expr(f).as(n) }: _*)
  }

  val qVegIndicesRowsSql: String = {
    val cols = indexFormulas.map { case (n, f) => s"  ($f) AS $n" }.mkString(",\n")
    s"""SELECT l_orderkey, l_linenumber,
       |$cols
       |FROM lineitem WHERE l_orderkey < 500""".stripMargin
  }

  /** String-function coverage over documents: case folding, replace,
    * accent translation (monthly.py:666,681), tokenize-first,
    * concat keys (SURVEY §2.8 string row). */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        lower(substring(col("text"), 1, 20)).as("prefix"),
        length(col("text")).as("n_len"),
        replace(col("lang"), lit("-"), lit("_")).as("lang_norm"),
        upper(col("source")).as("src"),
        concat_ws("|", col("lang"), col("source")).as("key"),
        element_at(split(col("text"), " "), 1).as("first_token"),
        translate(substring(col("text"), 1, 40), "éïàèç", "eiaec").as("folded"))
  }

  val qStringFuncsSql: String =
    """SELECT doc_id,
      |  lower(substr(text, 1, 20)) AS prefix,
      |  length(text) AS n_len,
      |  replace(lang, '-', '_') AS lang_norm,
      |  upper(source) AS src,
      |  concat_ws('|', lang, source) AS key,
      |  string_split(text, ' ')[1] AS first_token,
      |  translate(substr(text, 1, 40), 'éïàèç', 'eiaec') AS folded
      |FROM documents""".stripMargin

  /** Date-function coverage over events: quarter/day-of-year parts,
    * epoch millis (`ee.Date.millis`, monthly.py:256), week truncation,
    * interval arithmetic (`advance(1,'month')` analog,
    * height.py:257-258). */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("event_id") < 200)
      .select(
        col("event_id"),
        quarter(col("ts")).as("qtr"),
        dayofyear(col("ts")).as("doy"),
        unix_millis(col("ts")).as("epoch_ms"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week_start"),
        date_format(col("ts") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd HH:mm:ss").as("plus7"),
        date_format(add_months(col("ts"), 1), "yyyy-MM-dd").as("next_month"))
  }

  val qDateFuncsSql: String =
    """SELECT event_id,
      |  quarter(ts) AS qtr,
      |  dayofyear(ts) AS doy,
      |  epoch_ms(ts) AS epoch_ms,
      |  strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
      |  strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS plus7,
      |  strftime(CAST(ts AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
      |FROM events WHERE event_id < 200""".stripMargin

  /** Band scaling + normalization — the reference's
    * `multiply(0.0000275).add(-0.2)` L8 surface-reflectance rescale
    * (height.py:333-335) and `(x+ADD_BY)/DIVIDE_BY` normalize
    * (eesrtm.py:164-179) as plain arithmetic, aggregated per group. */
  def qScaleNormalize(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice") * 0.0000275 + -0.2).as("sr_scaled"),
        ((col("l_quantity") + 25.0) / 50.0).as("norm_qty"))
      .groupBy(col("l_returnflag"))
      .agg(qmean(col("sr_scaled")).as("avg_sr"),
           qmean(col("norm_qty")).as("avg_norm_qty"),
           count(lit(1)).as("n"))
  }

  val qScaleNormalizeSql: String =
    s"""SELECT l_returnflag,
       |  ${qmeanSql("l_extendedprice * 0.0000275 + -0.2")} AS avg_sr,
       |  ${qmeanSql("(l_quantity + 25.0) / 50.0")} AS avg_norm_qty,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_veg_indices" -> (qVegIndices _),
    "q_veg_indices_rows" -> (qVegIndicesRows _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_scale_normalize" -> (qScaleNormalize _),
  )

  val oracle: Map[String, String] = Map(
    "q_veg_indices" -> qVegIndicesSql,
    "q_veg_indices_rows" -> qVegIndicesRowsSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_scale_normalize" -> qScaleNormalizeSql,
  )
}
