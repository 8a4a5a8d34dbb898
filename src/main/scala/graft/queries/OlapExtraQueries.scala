package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.queries.Exact._

/** Remaining OLAP / array / JSON surface (SURVEY §2.4 quantiles +
  * cube, §2.5 cyclic index, §2.6 deterministic shuffle, §2.8 JSON).
  */
object OlapExtraQueries {

  /** Multi-quantile aggregate per group — the reference's
    * quantiles-per-image head (presto.py:689-709: 0.25/0.5/0.75 +
    * mean). Exact percentiles for the oracle; at 100 TB the library
    * swaps in percentile_approx (KLL-style sketch, mergeable). */
  def qQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.25)).as("q25"),
        percentile(col("value"), lit(0.5)).as("q50"),
        percentile(col("value"), lit(0.75)).as("q75"),
        dmean(col("value")).as("mean"),
        count(lit(1)).as("n"))
  }

  val qQuantilesSql: String =
    s"""SELECT event_type,
       |  quantile_cont(value, 0.25) AS q25,
       |  quantile_cont(value, 0.5) AS q50,
       |  quantile_cont(value, 0.75) AS q75,
       |  ${dmeanSql("value")} AS mean,
       |  COUNT(*) AS n
       |FROM events GROUP BY event_type""".stripMargin

  /** CUBE over two dimensions (SURVEY §2.4 grouping-sets row). */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
  }

  val qCubeSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_extendedprice")} AS sum_price, COUNT(*) AS n
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Schema-on-read JSON extraction from the props column
    * (SURVEY §2.8 JSON row: `json.load` metadata) — extract, cast,
    * aggregate. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
  }

  val qJsonExtractSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      |  COUNT(*) AS n, MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  /** Deterministic ("seeded") shuffle — the reference's
    * `wds.shuffle(1000, rng)` with a fixed seed (dataops/dataset.py:
    * 270-276): ordering by a keyed hash gives a reproducible
    * permutation with no RNG state, stable under any partitioning. */
  def qDeterministicShuffle(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(md5(concat(lit("seed42|"), col("event_id"))), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_id") < 300)
      .withColumn("shuffle_rank", row_number().over(w))
      .select("event_id", "shuffle_rank")
  }

  val qDeterministicShuffleSql: String =
    """SELECT event_id,
      |  ROW_NUMBER() OVER (ORDER BY md5('seed42|' || CAST(event_id AS VARCHAR)), event_id)
      |    AS shuffle_rank
      |FROM events WHERE event_id < 300""".stripMargin

  /** Cyclic month index — `fmod(arange(m, m+seq), 12)`
    * (presto.py:203-214): 12 positions from each entity's start
    * month, wrapping at year end. */
  def qCyclicIndex(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(month(min(col("ts"))).as("start_month"))
      .select(col("user_id"), col("start_month"),
        posexplode(expr("transform(sequence(0, 11), i -> (start_month - 1 + i) % 12)"))
          .as(Seq("i", "cyc_month")))
  }

  val qCyclicIndexSql: String =
    """SELECT user_id, start_month, r['i'] AS i, r['cyc'] AS cyc_month FROM (
      |  SELECT user_id, start_month,
      |    unnest(list_transform(range(12), i -> {'i': i, 'cyc': (start_month - 1 + i) % 12})) AS r
      |  FROM (SELECT user_id, month(MIN(ts)) AS start_month FROM events GROUP BY 1))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantiles" -> (qQuantiles _),
    "q_cube" -> (qCube _),
    "q_json_extract" -> (qJsonExtract _),
    "q_deterministic_shuffle" -> (qDeterministicShuffle _),
    "q_cyclic_index" -> (qCyclicIndex _),
  )

  val oracle: Map[String, String] = Map(
    "q_quantiles" -> qQuantilesSql,
    "q_cube" -> qCubeSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_deterministic_shuffle" -> qDeterministicShuffleSql,
    "q_cyclic_index" -> qCyclicIndexSql,
  )
}
