package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.PipelineOps
import graft.queries.Exact._

/** Feature-engineering pipeline surface (SURVEY §2.9): normalization
  * from a broadcast constants table, sufficient statistics, canonical
  * input assembly with availability masks, seeded MAE-style masking,
  * class-balanced subsampling, deterministic stratified splits, and
  * chipping.
  */
object PipelineQueries {

  /** One-pass per-band sufficient statistics (src/utils.py:12-49):
    * n, Σx, Σx² → mean, variance — a single shuffle on the group key;
    * the map-side partial aggregation is what makes this scale. */
  def qSufficientStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("event_type"))
      .agg(count(col("value")).as("n"),
        dsum(col("value")).as("sum_x"),
        dsum(col("value") * col("value")).as("sum_x2"))
      .withColumn("mean", col("sum_x") / col("n"))
      .withColumn("variance",
        col("sum_x2") / col("n") - (col("sum_x") / col("n")) * (col("sum_x") / col("n")))
  }

  val qSufficientStatsSql: String =
    s"""SELECT event_type, n, sum_x, sum_x2,
       |  sum_x / n AS mean,
       |  sum_x2 / n - (sum_x / n) * (sum_x / n) AS variance
       |FROM (
       |  SELECT event_type, COUNT(value) AS n,
       |    ${dsumSql("value")} AS sum_x,
       |    ${dsumSql("value * value")} AS sum_x2
       |  FROM events GROUP BY event_type)""".stripMargin

  /** Normalization from a broadcast constants table — the reference's
    * per-band `(x + ADD_BY) / DIVIDE_BY` with compile-time constants
    * (eesrtm.py:164-179) becomes a data-driven broadcast join, so new
    * bands need no code change. */
  def qNormalizeBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val consts = Seq(("click", 10.0, 120.0), ("view", 5.0, 80.0), ("purchase", 0.0, 500.0))
      .toDF("event_type", "add_by", "divide_by")
    Tables.events(spark, dir)
      .join(broadcast(consts), "event_type")
      .withColumn("norm_value", (col("value") + col("add_by")) / col("divide_by"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), qmean(col("norm_value")).as("avg_norm"))
  }

  val qNormalizeBandsSql: String =
    s"""WITH consts(event_type, add_by, divide_by) AS (
       |  VALUES ('click', 10.0, 120.0), ('view', 5.0, 80.0), ('purchase', 0.0, 500.0))
       |SELECT e.event_type, COUNT(*) AS n,
       |  ${qmeanSql("(e.value + c.add_by) / c.divide_by")} AS avg_norm
       |FROM events e JOIN consts c ON e.event_type = c.event_type
       |GROUP BY e.event_type""".stripMargin

  /** Canonical input assembly (dataops/utils.py:18-93
    * `construct_single_presto_input`): join per-source monthly
    * aggregates into one canonical row per (user, month) with
    * availability masks; missing sources coalesce to a default and
    * flag mask=1 (the reference's DW default class 9 / zero-fill). */
  def qInputAssembly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def src(t: String, as: String): DataFrame =
      ev.filter(col("event_type") === t)
        .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(percentile(col("value"), lit(0.5)).as(as))
    val spine = ev.select(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month")).distinct()
    spine
      .join(src("click", "s1"), Seq("user_id", "month"), "left")
      .join(src("view", "s2"), Seq("user_id", "month"), "left")
      .join(src("purchase", "srtm"), Seq("user_id", "month"), "left")
      .select(col("user_id"), col("month"),
        coalesce(col("s1"), lit(0.0)).as("s1_val"),
        coalesce(col("s2"), lit(0.0)).as("s2_val"),
        coalesce(col("srtm"), lit(0.0)).as("srtm_val"),
        col("s1").isNull.cast("int").as("mask_s1"),
        col("s2").isNull.cast("int").as("mask_s2"),
        col("srtm").isNull.cast("int").as("mask_srtm"))
  }

  val qInputAssemblySql: String =
    """WITH spine AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m') AS month FROM events),
      |s1 AS (SELECT user_id, strftime(ts, '%Y-%m') AS month, quantile_cont(value, 0.5) AS v
      |       FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |s2 AS (SELECT user_id, strftime(ts, '%Y-%m') AS month, quantile_cont(value, 0.5) AS v
      |       FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |s3 AS (SELECT user_id, strftime(ts, '%Y-%m') AS month, quantile_cont(value, 0.5) AS v
      |       FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT sp.user_id, sp.month,
      |  COALESCE(s1.v, 0.0) AS s1_val, COALESCE(s2.v, 0.0) AS s2_val,
      |  COALESCE(s3.v, 0.0) AS srtm_val,
      |  CAST(s1.v IS NULL AS INT) AS mask_s1,
      |  CAST(s2.v IS NULL AS INT) AS mask_s2,
      |  CAST(s3.v IS NULL AS INT) AS mask_srtm
      |FROM spine sp
      |LEFT JOIN s1 ON s1.user_id = sp.user_id AND s1.month = sp.month
      |LEFT JOIN s2 ON s2.user_id = sp.user_id AND s2.month = sp.month
      |LEFT JOIN s3 ON s3.user_id = sp.user_id AND s3.month = sp.month""".stripMargin

  /** Seeded MAE mask generation + application (masking.py:17-117,
    * 134-146): per (user, month) a hash digit picks the strategy
    * (random timesteps vs chunked timesteps, ratio 0.5); per position
    * the mask is hash-derived; x zeroes masked slots, y keeps only
    * masked slots. Fully reproducible under repartitioning. */
  def qMaskGeneration(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val keyed = ev
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(percentile(col("value"), lit(0.5)).as("v"))
      .withColumn("pos", explode(sequence(lit(0), lit(11))))
      .withColumn("k", concat_ws("|", col("user_id"), col("month")))
    val strat = PipelineOps.hexDigit("k", 1) % 2
    val chunkStart = PipelineOps.hexDigit("k", 2) % 7
    val randMask = expr(PipelineOps.hexDigitSql("k", "pos + 3")) < 8
    keyed
      .withColumn("strategy",
        when(strat === 0, "random_timesteps").otherwise("chunk_timesteps"))
      .withColumn("masked",
        when(strat === 0, randMask)
        .otherwise(col("pos") >= chunkStart && col("pos") < chunkStart + 6))
      .select(col("user_id"), col("month"), col("pos"), col("strategy"),
        col("masked").cast("int").as("masked"),
        when(col("masked"), lit(0.0)).otherwise(col("v")).as("x_eo"),
        when(col("masked"), col("v")).otherwise(lit(null)).as("y_eo"))
  }

  val qMaskGenerationSql: String = {
    val d1 = PipelineOps.hexDigitSql("k", "1")
    val d2 = PipelineOps.hexDigitSql("k", "2")
    val dp = PipelineOps.hexDigitSql("k", "pos + 3").replace("instr(", "strpos(")
    s"""WITH g AS (
       |  SELECT user_id, strftime(ts, '%Y-%m') AS month, quantile_cont(value, 0.5) AS v
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT user_id, month, v, unnest(range(12)) AS pos,
       |         concat_ws('|', user_id, month) AS k
       |  FROM g),
       |m AS (
       |  SELECT user_id, month, pos,
       |    CASE WHEN ${d1.replace("instr(", "strpos(")} % 2 = 0
       |         THEN 'random_timesteps' ELSE 'chunk_timesteps' END AS strategy,
       |    CASE WHEN ${d1.replace("instr(", "strpos(")} % 2 = 0
       |         THEN ($dp < 8)
       |         ELSE (pos >= ${d2.replace("instr(", "strpos(")} % 7
       |               AND pos < ${d2.replace("instr(", "strpos(")} % 7 + 6) END AS masked,
       |    v
       |  FROM p)
       |SELECT user_id, month, pos, strategy, CAST(masked AS INT) AS masked,
       |  CASE WHEN masked THEN 0.0 ELSE v END AS x_eo,
       |  CASE WHEN masked THEN v ELSE NULL END AS y_eo
       |FROM m""".stripMargin
  }

  /** Typed-Aggregator sufficient stats (operators.ExactSuffStats):
    * the same statistics as q_sufficient_stats but via a custom
    * Aggregator with an exact integer buffer — one pass, one shuffle,
    * order-independent on any partitioning. */
  def qSuffstatsTyped(spark: SparkSession, dir: String): DataFrame = {
    val ss = udaf(graft.operators.ExactSuffStats)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(ss(col("value")).as("s"))
      .select(col("event_type"), col("s.n").as("n"),
        col("s.mean").as("mean"), col("s.variance").as("variance"))
  }

  val qSuffstatsTypedSql: String =
    """SELECT event_type, n,
      |  CAST(s2 AS DOUBLE) / 100.0 / n AS mean,
      |  CAST(s4 AS DOUBLE) / 10000.0 / n
      |    - (CAST(s2 AS DOUBLE) / 100.0 / n) * (CAST(s2 AS DOUBLE) / 100.0 / n) AS variance
      |FROM (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(round(value * 100.0) AS BIGINT)) AS s2,
      |    SUM(CAST(round(value * 100.0) AS BIGINT) * CAST(round(value * 100.0) AS BIGINT)) AS s4
      |  FROM events GROUP BY 1)""".stripMargin

  /** Class-balanced subsample: first n per class by deterministic
    * order (eval/cropharvest_eval.py:286-293) — one window, shuffles
    * only on the class key. */
  def qClassBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    Tables.embeddings(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("label", "rk", "vec_id")
  }

  val qClassBalanceSql: String =
    """SELECT label, rk, vec_id FROM (
      |  SELECT label, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rk
      |  FROM embeddings) WHERE rk <= 10""".stripMargin

  /** Deterministic stratified split: per-row hash split + per
    * (label, split) counts — reproducible train/val assignment with
    * zero coordination. */
  def qStratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(spark, dir)
      .withColumn("split", PipelineOps.hashSplit("cast(vec_id AS string)", 12))
      .groupBy(col("label"), col("split"))
      .agg(count(lit(1)).as("n"))
  }

  val qStratifiedSplitSql: String = {
    val split = PipelineOps.hashSplitSql("cast(vec_id AS VARCHAR)", 12)
      .replace("instr(", "strpos(")
    s"""SELECT label, $split AS split, COUNT(*) AS n
       |FROM embeddings GROUP BY 1, 2""".stripMargin
  }

  /** Chipping (src/process_data.py:52-82): bin points into fixed-size
    * chips by integer division of their grid coordinates; per-chip
    * counts + value extrema. */
  def qChipping(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("chip_u", floor(col("user_id") / 5).cast("long"))
      .withColumn("chip_d", floor(dayofmonth(col("ts")) / 8).cast("long"))
      .groupBy(col("chip_u"), col("chip_d"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
  }

  val qChippingSql: String =
    """SELECT CAST(FLOOR(user_id / 5) AS BIGINT) AS chip_u,
      |       CAST(FLOOR(day(ts) / 8) AS BIGINT) AS chip_d,
      |       COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Mosaiks1d featurizer (model.py:126-145): fixed conv patches of
    * length 3 slide over each entity's padded 12-step series; each
    * window takes ReLU(patch·window); features are the window means.
    * Pure higher-order-function arithmetic — sequential folds keep it
    * bit-exact cross-engine; at scale it's one groupBy(user, month)
    * shuffle then map-side math. */
  def qMosaiks1d(spark: SparkSession, dir: String): DataFrame = {
    val padded = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("s"))
      .withColumn("arr", expr("transform(s, x -> x.value)"))
      .withColumn("padded",
        when(size(col("arr")) < 12,
          concat(col("arr"), expr("array_repeat(arr[0], 12 - size(arr))")))
        .otherwise(slice(col("arr"), 1, 12)))
    def feat(w0: String, w1: String, w2: String): String =
      s"""aggregate(transform(sequence(0, 9),
         |  t -> greatest($w0 * padded[t] + $w1 * padded[t+1] + $w2 * padded[t+2], 0D)),
         |  0D, (a, v) -> a + v) / 10.0""".stripMargin
    padded.select(col("user_id"), col("month"),
      expr(feat("0.5", "-1.0", "0.5")).as("f0"),
      expr(feat("0.25", "0.25", "-0.5")).as("f1"))
  }

  val qMosaiks1dSql: String = {
    def feat(w0: String, w1: String, w2: String): String =
      s"""list_reduce(list_transform(range(10),
         |    t -> greatest($w0 * padded[t+1] + $w1 * padded[t+2] + $w2 * padded[t+3], 0.0)),
         |    (a, v) -> a + v) / 10.0""".stripMargin
    s"""WITH g AS (
       |  SELECT user_id, strftime(ts, '%Y-%m') AS month,
       |         list(value ORDER BY ts, event_id) AS arr
       |  FROM events GROUP BY 1, 2),
       |p AS (
       |  SELECT user_id, month,
       |    CASE WHEN len(arr) < 12
       |         THEN list_concat(arr, list_transform(range(12 - len(arr)), i -> arr[1]))
       |         ELSE list_slice(arr, 1, 12) END AS padded
       |  FROM g)
       |SELECT user_id, month,
       |  ${feat("0.5", "-1.0", "0.5")} AS f0,
       |  ${feat("0.25", "0.25", "-0.5")} AS f1
       |FROM p""".stripMargin
  }

  /** Data-availability count gate driving a conditional pipeline —
    * the reference's reduceRegion(count) guard
    * (height_processing_data_collection.py:442-456): quality-masked
    * pixel counts per region decide whether the region's whole
    * extraction runs at all. Declaratively the "if count > threshold"
    * branch is a semi-join: per-region valid counts inside the
    * seasonal window, HAVING the threshold, then the continuation
    * (weekly aggregates) runs only over surviving regions — one plan,
    * no driver-side branching, and the skipped regions' data is never
    * aggregated. At 100 TB the gate side is a tiny aggregate that
    * broadcast-semi-joins into the big scan. */
  def qCountGate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val gate = ev.filter(col("value") > 90.0 && dayofmonth(col("ts")) <= 15)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_valid"))
      .filter(col("n_valid") >= 5)
    ev.join(gate.select("user_id"), Seq("user_id"), "left_semi")
      .groupBy(col("user_id"),
        floor((dayofmonth(col("ts")) - 1) / 7.0).cast("int").as("wk"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  val qCountGateSql: String =
    s"""WITH gate AS (
       |  SELECT user_id FROM events
       |  WHERE value > 90.0 AND day(ts) <= 15
       |  GROUP BY user_id HAVING COUNT(*) >= 5)
       |SELECT e.user_id, CAST(FLOOR((day(e.ts) - 1) / 7.0) AS INT) AS wk,
       |  COUNT(*) AS n, ${dsumSql("e.value")} AS sum_value
       |FROM events e
       |WHERE e.user_id IN (SELECT user_id FROM gate)
       |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_count_gate" -> (qCountGate _),
    "q_mosaiks1d" -> (qMosaiks1d _),
    "q_sufficient_stats" -> (qSufficientStats _),
    "q_suffstats_typed" -> (qSuffstatsTyped _),
    "q_normalize_bands" -> (qNormalizeBands _),
    "q_input_assembly" -> (qInputAssembly _),
    "q_mask_generation" -> (qMaskGeneration _),
    "q_class_balance" -> (qClassBalance _),
    "q_stratified_split" -> (qStratifiedSplit _),
    "q_chipping" -> (qChipping _),
  )

  val oracle: Map[String, String] = Map(
    "q_count_gate" -> qCountGateSql,
    "q_mosaiks1d" -> qMosaiks1dSql,
    "q_sufficient_stats" -> qSufficientStatsSql,
    "q_suffstats_typed" -> qSuffstatsTypedSql,
    "q_normalize_bands" -> qNormalizeBandsSql,
    "q_input_assembly" -> qInputAssemblySql,
    "q_mask_generation" -> qMaskGenerationSql,
    "q_class_balance" -> qClassBalanceSql,
    "q_stratified_split" -> qStratifiedSplitSql,
    "q_chipping" -> qChippingSql,
  )
}
