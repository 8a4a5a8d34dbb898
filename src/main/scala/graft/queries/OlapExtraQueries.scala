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

  /** Explicit GROUPING SETS — the third grouping-set form
    * (SURVEY §2.4 last row) alongside [[qCube]] and q_rollup: a
    * hand-picked set list {(event_type), (user_bucket), ()} that
    * neither ROLLUP nor CUBE generates (no (event_type, user_bucket)
    * cell). Same partial-agg + expand physical shape as rollup/cube —
    * one shuffle keyed on the grouping columns. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("user_bucket", (col("user_id") % 10).cast("int"))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("user_bucket")), Seq.empty),
        col("event_type"), col("user_bucket"))
      .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
  }

  val qGroupingSetsSql: String =
    s"""SELECT event_type, CAST(user_id % 10 AS INT) AS user_bucket,
       |  ${dsumSql("value")} AS sum_value, COUNT(*) AS n
       |FROM events
       |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 10 AS INT)), ())""".stripMargin

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
    * permutation with no RNG state, stable under any partitioning.
    *
    * Both declared forms run through the corpus-scale engine path
    * ([[graft.operators.ScaleOps.deterministicShuffle]]: ONE
    * range-partition shuffle + per-partition sort + partition-offset
    * rank — never a partition-less window), graded against DuckDB's
    * global ROW_NUMBER. The bounded variant keeps the historical
    * event_id < 300 slice for round-over-round comparability; the
    * corpus-wide [[qShuffleRank]] is the scale form. */
  def qDeterministicShuffle(spark: SparkSession, dir: String): DataFrame = {
    graft.operators.ScaleOps.deterministicShuffle(
        Tables.events(spark, dir).filter(col("event_id") < 300).select("event_id"),
        "event_id", "seed42")
      .select("event_id", "shuffle_rank")
  }

  val qDeterministicShuffleSql: String =
    """SELECT event_id,
      |  ROW_NUMBER() OVER (ORDER BY md5('seed42|' || CAST(event_id AS VARCHAR)), event_id)
      |    AS shuffle_rank
      |FROM events WHERE event_id < 300""".stripMargin

  /** Corpus-wide seeded shuffle rank over the FULL events table — the
    * unbounded form whose global permutation a single window could
    * not assign at scale. Rank assignment is partition-offset style
    * (zipWithIndex contract); the oracle states the same total order
    * as one global ROW_NUMBER. */
  def qShuffleRank(spark: SparkSession, dir: String): DataFrame = {
    graft.operators.ScaleOps.deterministicShuffle(
        Tables.events(spark, dir).select("event_id"), "event_id", "seed42")
      .select("event_id", "shuffle_rank")
  }

  val qShuffleRankSql: String =
    """SELECT event_id,
      |  ROW_NUMBER() OVER (ORDER BY md5('seed42|' || CAST(event_id AS VARCHAR)), event_id)
      |    AS shuffle_rank
      |FROM events""".stripMargin

  /** Skew-salted join, graded against the PLAIN inner-join oracle —
    * result identity is the whole point of salting (SURVEY §2.3
    * "skew-safe"): orders→customer replayed through
    * [[graft.operators.ScaleOps.saltedInnerJoin]] with salt=8, then
    * aggregated per market segment. At 100 TB the probe side's hot
    * customer keys spread over 8 reducers instead of one straggler
    * (the build side replicates 8x — dimension-sized, so the
    * replication is cheap); locally AQE may still broadcast the tiny
    * build side, which changes nothing about the output the oracle
    * checks. The probe salt hashes o_orderkey — a DETERMINISTIC
    * per-row discriminator, so a fetch-failure recompute re-salts
    * identically. Price sum is the exact decimal accumulate
    * (Exact.dsum), so the 8-way split cannot perturb last ulps. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"), col("o_orderkey"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.operators.ScaleOps.saltedInnerJoin(orders, cust, "c_custkey", salt = 8,
        probeSalt = col("o_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
  }

  val qSaltedJoinSql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  ${dsumSql("o_totalprice")} AS sum_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment""".stripMargin

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

  /** Pivot (long → wide): per-day event counts spread into one column
    * per event type. Uses the explicit-values form of
    * `RelationalGroupedDataset.pivot` — with the value list given, no
    * discovery pass over the data runs and the plan is a single
    * shuffle-free-after-scan hash aggregate with conditional counts,
    * exactly what the oracle's CASE form states. Absent combinations
    * are 0 (the SQL conditional-count convention), not null. */
  /** The closed event-type vocabulary both pivot sides use. The
    * explicit list is what makes the pivot discovery-free; the
    * unpivot oracle restricts to the same values so an unforeseen
    * sixth type in future data degrades both sides identically
    * instead of silently diverging. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val eventTypesInSql = EventTypes.map(t => s"'$t'").mkString("(", ", ", ")")

  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = EventTypes
    Tables.events(spark, dir)
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  val qPivotSql: String =
    """SELECT day(ts) AS day,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1""".stripMargin

  /** Unpivot (wide → long): melts the pivoted per-day counts back to
    * (day, event_type, n) — `Dataset.unpivot`, the inverse operator.
    * Round-tripping the pivot output makes the pair self-checking:
    * the result must equal a plain groupBy(day, type) count. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val types = EventTypes
    qPivot(spark, dir)
      .unpivot(Array(col("day")), types.map(col).toArray, "event_type", "n")
      .filter(col("n") > 0)
  }

  val qUnpivotSql: String =
    s"""SELECT day(ts) AS day, event_type, COUNT(*) AS n
       |FROM events WHERE event_type IN $eventTypesInSql
       |GROUP BY 1, 2""".stripMargin

  /** The ranking-window surface in one query: rank / dense_rank /
    * percent_rank / cume_dist over a coarsened value bucket (so ties
    * exist and the five functions genuinely differ), plus ntile over
    * a total order (ntile splits peers by row position, so its
    * ordering must be total to be deterministic). All outputs are
    * integer-ratio doubles or ints — bit-exact cross-engine. */
  def qWindowRanks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val peers = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val total = Window.partitionBy(col("event_type")).orderBy(col("bucket"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_id") < 2000)
      .select(col("event_id"), col("event_type"),
        floor(col("value") / 50.0).as("bucket"))
      .withColumn("rk", rank().over(peers))
      .withColumn("drk", dense_rank().over(peers))
      .withColumn("prk", percent_rank().over(peers))
      .withColumn("cd", cume_dist().over(peers))
      .withColumn("tile", ntile(4).over(total))
  }

  val qWindowRanksSql: String =
    """SELECT event_id, event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
      |  CAST(RANK() OVER peers AS INT) AS rk,
      |  CAST(DENSE_RANK() OVER peers AS INT) AS drk,
      |  PERCENT_RANK() OVER peers AS prk,
      |  CUME_DIST() OVER peers AS cd,
      |  CAST(NTILE(4) OVER (PARTITION BY event_type
      |    ORDER BY FLOOR(value / 50.0), event_id) AS INT) AS tile
      |FROM events WHERE event_id < 2000
      |WINDOW peers AS (PARTITION BY event_type ORDER BY FLOOR(value / 50.0))""".stripMargin

  /** Running DISTINCT count per key — `COUNT(DISTINCT) OVER`, which
    * Spark's window functions don't support directly. The scalable
    * rewrite: mark each (user, event_type)'s FIRST occurrence with a
    * row_number()=1 flag, then running-sum the flags over the user's
    * time order. No per-row set state ever materializes (the naive
    * collect_set-over-window carries the whole distinct set in every
    * row's frame — O(row × distinct) memory), both windows are keyed
    * (user_id, event_type) / (user_id) so the plan is two keyed
    * shuffles and nothing global; the ROWS frame plus the
    * (ts, event_id) total order make the running sum deterministic
    * under any partitioning. Reference: per-entity cumulative
    * coverage stats, monthly.py composites family. */
  def qWindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("first_seen",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .withColumn("distinct_types_so_far", sum(col("first_seen")).over(running))
      .select("user_id", "event_id", "distinct_types_so_far")
  }

  val qWindowDistinctSql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS distinct_types_so_far
      |FROM (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                                 ORDER BY ts, event_id) = 1
      |         THEN 1 ELSE 0 END AS first_seen
      |  FROM events)""".stripMargin

  /** Sequential funnel: users who viewed, then clicked AFTER their
    * first view, then purchased AFTER that first click. Each stage is
    * a groupBy(user) min-timestamp + a join carrying the previous
    * stage's anchor — the standard behavioural-analytics shape. Per
    * stage the join's right side shrinks (survivors only), and every
    * join keys on user_id — co-partitioned, no cartesian. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    // time arithmetic at integer microseconds (unix_micros / epoch_us
    // floor identically) so strict > can't straddle the ns→µs
    // truncation differently across engines
    val ev = Tables.events(spark, dir).withColumn("tus", unix_micros(col("ts")))
    val viewed = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_view"))
    val clicked = ev.filter(col("event_type") === "click")
      .join(viewed, "user_id").filter(col("tus") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_click"))
    val purchased = ev.filter(col("event_type") === "purchase")
      .join(clicked, "user_id").filter(col("tus") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_purchase"))
    viewed.select(lit("1_view").as("stage"), col("user_id"))
      .union(clicked.select(lit("2_click").as("stage"), col("user_id")))
      .union(purchased.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy(col("stage")).agg(count(lit(1)).as("users"))
  }

  val qFunnelSql: String =
    """WITH viewed AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |clicked AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click FROM events e
      |  JOIN viewed v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view GROUP BY 1),
      |purchased AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase FROM events e
      |  JOIN clicked c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click GROUP BY 1),
      |stages AS (
      |  SELECT '1_view' AS stage, user_id FROM viewed
      |  UNION ALL SELECT '2_click', user_id FROM clicked
      |  UNION ALL SELECT '3_purchase', user_id FROM purchased)
      |SELECT stage, COUNT(*) AS users FROM stages GROUP BY 1""".stripMargin

  /** SCD type-2 interval construction — the ETL shape that turns an
    * event log into a slowly-changing-dimension table: per user, runs
    * of the same event_type collapse to one validity interval
    * [valid_from, valid_to), the last interval left open (NULL
    * valid_to = current). Classic gaps-and-islands: a lag-change flag,
    * a running sum as the island id (both over ONE user-keyed ordered
    * window), one groupBy for the interval bounds, and a lead for the
    * exclusive end. Timestamps compare at integer microseconds (the
    * q_funnel rule). No self-join, no global window — the per-user
    * series is the unit of work at any scale. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"), col("tus"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
             lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("grp"))
      .agg(first(col("event_type")).as("attr_value"),
        min(col("tus")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .select("user_id", "attr_value", "valid_from", "valid_to", "n_events")
  }

  val qScd2Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
      |    CASE WHEN lag(event_type, 1) OVER w IS NULL
      |           OR lag(event_type, 1) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |grouped AS (
      |  SELECT user_id, event_id, tus, event_type,
      |    SUM(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM flagged),
      |intervals AS (
      |  SELECT user_id, grp, ANY_VALUE(event_type) AS attr_value,
      |    MIN(tus) AS valid_from, COUNT(*) AS n_events
      |  FROM grouped GROUP BY user_id, grp)
      |SELECT user_id, attr_value, valid_from,
      |  lead(valid_from, 1) OVER (PARTITION BY user_id ORDER BY valid_from)
      |    AS valid_to,
      |  n_events
      |FROM intervals""".stripMargin

  /** Per-group Pareto frontier (skyline) — the multi-objective top-k
    * of the OLAP surface: within each brand, the parts not strictly
    * dominated on (price, size) by any other part (no other part both
    * strictly cheaper AND strictly smaller). One brand-keyed window
    * ordered by exact integer price-cents: the running min of size
    * over STRICTLY cheaper rows (a range frame ending at −1) decides
    * domination — no quadratic NOT-EXISTS self-join, which is exactly
    * the rewrite that survives a 100× part table. The DuckDB oracle
    * states the quadratic definition directly, proving the window
    * rewrite equivalent. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("p_retailprice") * 100).cast("long")
    val w = Window.partitionBy(col("p_brand")).orderBy(col("price_cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        cents.as("price_cents"))
      .withColumn("min_size_cheaper", min(col("p_size")).over(w))
      .filter(col("min_size_cheaper").isNull ||
              col("min_size_cheaper") >= col("p_size"))
      .select("p_brand", "p_partkey", "price_cents", "p_size")
  }

  val qSkylineSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_brand, p_size,
      |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      |  FROM part)
      |SELECT a.p_brand, a.p_partkey, a.price_cents, a.p_size
      |FROM p a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p d
      |  WHERE d.p_brand = a.p_brand
      |    AND d.price_cents < a.price_cents
      |    AND d.p_size < a.p_size)""".stripMargin

  /** Column statistics profiler — the ANALYZE-style pass an engine
    * runs to feed its cost model (NDV for join planning, null
    * fractions for selectivity, min/max for zone maps): one unpivot
    * fans three lineitem measures into (column, value) rows, then ONE
    * keyed aggregation computes count / nulls / exact NDV / min / max
    * per column. At 100 TB the exact NDV swaps to the HLL sketch
    * (q_distinct_approx's tier) with the identical plan shape; the
    * unpivot keeps it one scan for any number of profiled columns —
    * per-column scans would multiply the read. */
  def qColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(expr(
        """stack(3,
          |  'l_quantity', l_quantity,
          |  'l_extendedprice', l_extendedprice,
          |  'l_discount', l_discount)""".stripMargin).as(Seq("col_name", "v")))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("ndv"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }

  val qColumnProfileSql: String =
    """SELECT col_name, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
      |  MIN(v) AS min_v, MAX(v) AS max_v
      |FROM (
      |  SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT 'l_discount', l_discount FROM lineitem)
      |GROUP BY col_name""".stripMargin

  /** Incremental aggregate maintenance — the daily-ETL merge shape: a
    * standing per-user summary (days 1–14 of the month) absorbs the
    * new partition's partial aggregate (day 15 onward) WITHOUT
    * rescanning history: merged = full-outer join on the key +
    * coalesced sufficient-statistic addition (counts add; decimal
    * sums add; mins/maxes combine). The oracle recomputes the summary
    * from the full table, so a green hash proves the merge operator
    * equals the rescan — the mergeability that makes 100 TB rollups
    * incremental (each day touches one partition, never the corpus).
    * Mirrors the reference's idempotent skip-if-exists accumulation
    * (ee_pipeline.py:125-140) done relationally. */
  def qIncrAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("d", dayofmonth(col("ts")))
    def summarize(part: DataFrame): DataFrame = part.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).as("s"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    val old = summarize(ev.filter(col("d") <= 14))
      .select(col("user_id"), col("n").as("n_old"), col("s").as("s_old"),
        col("mn").as("mn_old"), col("mx").as("mx_old"))
    val fresh = summarize(ev.filter(col("d") >= 15))
      .select(col("user_id"), col("n").as("n_new"), col("s").as("s_new"),
        col("mn").as("mn_new"), col("mx").as("mx_new"))
    old.join(fresh, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_new"), lit(0L))).as("n"),
        (coalesce(col("s_old"), lit(0).cast(Dec)) +
         coalesce(col("s_new"), lit(0).cast(Dec))).cast("double").as("sum_value"),
        least(coalesce(col("mn_old"), col("mn_new")),
              coalesce(col("mn_new"), col("mn_old"))).as("min_value"),
        greatest(coalesce(col("mx_old"), col("mx_new")),
                 coalesce(col("mx_new"), col("mx_old"))).as("max_value"))
  }

  val qIncrAggSql: String =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY user_id""".stripMargin

  /** Multi-count single-scan report — the TPC-DS Q88 shape: many
    * disjoint conditional counts (here: per event-type × value-band
    * cell) answered by ONE pass with N conditional aggregates, where
    * the naive form is N separate filtered scans (or an N-way
    * self-join union). The plan is one scan + one single-row partial
    * agg — nothing but 9 accumulators crosses the wire; the shape a
    * reporting dashboard compiles its tile battery into. */
  def qMultiCount(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def cnt(t: String, lo: Double, hi: Double) =
      sum(when(col("event_type") === t && col("value") >= lo && col("value") < hi,
        1L).otherwise(0L))
    ev.agg(
      cnt("click", 0.0, 50.0).as("click_low"),
      cnt("click", 50.0, 200.0).as("click_mid"),
      cnt("click", 200.0, 1e9).as("click_high"),
      cnt("view", 0.0, 50.0).as("view_low"),
      cnt("view", 50.0, 200.0).as("view_mid"),
      cnt("view", 200.0, 1e9).as("view_high"),
      cnt("purchase", 0.0, 50.0).as("purchase_low"),
      cnt("purchase", 50.0, 200.0).as("purchase_mid"),
      cnt("purchase", 200.0, 1e9).as("purchase_high"))
  }

  val qMultiCountSql: String = {
    def cnt(t: String, lo: String, hi: String, as: String) =
      s"CAST(SUM(CASE WHEN event_type = '$t' AND value >= $lo AND value < $hi THEN 1 ELSE 0 END) AS BIGINT) AS $as"
    s"""SELECT
       |  ${cnt("click", "0.0", "50.0", "click_low")},
       |  ${cnt("click", "50.0", "200.0", "click_mid")},
       |  ${cnt("click", "200.0", "1e9", "click_high")},
       |  ${cnt("view", "0.0", "50.0", "view_low")},
       |  ${cnt("view", "50.0", "200.0", "view_mid")},
       |  ${cnt("view", "200.0", "1e9", "view_high")},
       |  ${cnt("purchase", "0.0", "50.0", "purchase_low")},
       |  ${cnt("purchase", "50.0", "200.0", "purchase_mid")},
       |  ${cnt("purchase", "200.0", "1e9", "purchase_high")}
       |FROM events""".stripMargin
  }

  /** ROLLUP with GROUPING() indicators — the part of the grouping-set
    * surface q_rollup/q_cube leave implicit: the grouping_id bitmask
    * and per-column grouping flags that let a consumer tell a real
    * NULL key from a subtotal row (the standard OLAP-cube metadata
    * columns). Same one-shuffle expand plan as rollup. */
  def qGroupingId(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))
  }

  val qGroupingIdSql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Discrete percentile (percentile_disc semantics): the smallest
    * ACTUAL value at or above each rank cutoff — no interpolation, so
    * the result is always a member of the data (what a capacity
    * planner wants from a latency p95). Implemented per group as an
    * ordered-array selection (`collect_list` + `sort_array` +
    * ceil-rank index) — the group cardinality is the per-key series,
    * bounded; at corpus scale the same semantics come from the KLL
    * sketch's rank query. */
  def qPercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("vs"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        expr("vs[CAST(ceil(0.5 * n) AS INT) - 1]").as("p50_disc"),
        expr("vs[CAST(ceil(0.9 * n) AS INT) - 1]").as("p90_disc"),
        expr("vs[CAST(ceil(0.99 * n) AS INT) - 1]").as("p99_disc"))
  }

  val qPercentileDiscSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  (list_sort(list(value)))[CAST(ceil(0.5 * COUNT(*)) AS INT)] AS p50_disc,
      |  (list_sort(list(value)))[CAST(ceil(0.9 * COUNT(*)) AS INT)] AS p90_disc,
      |  (list_sort(list(value)))[CAST(ceil(0.99 * COUNT(*)) AS INT)] AS p99_disc
      |FROM events GROUP BY event_type""".stripMargin

  /** Hopping (sliding) windows — `window(ts, 4 days, 2 days)`: each
    * event lands in the two overlapping windows covering it, the
    * aggregation is per (window, type) — the batch form of the
    * streaming sliding-window composite (SURVEY §2.10 notes sliding
    * windows as engine surface). The fan-out is the window overlap
    * factor (2), paid at map side before one keyed shuffle. */
  def qHopping(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "4 days", "2 days"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  val qHoppingSql: String =
    s"""WITH hopped AS (
       |  SELECT e.event_type, e.value, hop.s AS w_start
       |  FROM events e, UNNEST([
       |      CAST(FLOOR((epoch(e.ts) - 0) / 172800) AS BIGINT) * 172800 - 172800,
       |      CAST(FLOOR((epoch(e.ts) - 0) / 172800) AS BIGINT) * 172800
       |    ]) AS hop(s)
       |  WHERE epoch(e.ts) >= hop.s AND epoch(e.ts) < hop.s + 345600)
       |SELECT w_start, event_type, COUNT(*) AS n,
       |  ${dsumSql("value")} AS sum_value
       |FROM hopped GROUP BY 1, 2""".stripMargin

  /** Ordered string aggregation (LISTAGG / string_agg ... ORDER BY):
    * each user's first five event types joined into a '>'-separated
    * path string — the readable journey column a product-analytics
    * export ships. Determinism is the point: the aggregation ORDER
    * (ts, event_id) is part of the semantics, expressed in Spark as
    * sort_array over (key, value) structs before the join — collect
    * order never leaks through. */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("tus"), col("event_id"),
        col("event_type")))).as("s"))
      .select(col("user_id"),
        expr("concat_ws('>', transform(slice(s, 1, 5), x -> x.event_type))")
          .as("path"),
        size(col("s")).cast("long").as("n_events"))
  }

  val qStringAggSql: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id,
      |  string_agg(event_type, '>' ORDER BY rk) AS path,
      |  ANY_VALUE(n_events) AS n_events
      |FROM r WHERE rk <= 5
      |GROUP BY user_id""".stripMargin

  /** Band (range-lookup) join: each value finds its grade in a small
    * range-dimension table via a BETWEEN predicate — the classic
    * tax-bracket/grade-band shape equi-joins can't express. The band
    * table broadcasts (non-equi broadcast join — the sanctioned
    * nested loop against a 4-row build side); at scale the
    * alternative rewrite is a width_bucket-style computed key, but
    * the JOIN form survives irregular band edges. */
  def qBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("D", 0.0, 100.0), ("C", 100.0, 300.0),
      ("B", 300.0, 450.0), ("A", 450.0, 1e9)).toDF("grade", "lo", "hi")
    Tables.events(spark, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("grade"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  val qBandJoinSql: String =
    s"""WITH bands(grade, lo, hi) AS (
       |  VALUES ('D', 0.0, 100.0), ('C', 100.0, 300.0),
       |         ('B', 300.0, 450.0), ('A', 450.0, 1e9))
       |SELECT b.grade, COUNT(*) AS n, ${dsumSql("e.value")} AS sum_value
       |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       |GROUP BY b.grade""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_agg" -> (qStringAgg _),
    "q_band_join" -> (qBandJoin _),
    "q_multi_count" -> (qMultiCount _),
    "q_grouping_id" -> (qGroupingId _),
    "q_percentile_disc" -> (qPercentileDisc _),
    "q_hopping" -> (qHopping _),
    "q_incr_agg" -> (qIncrAgg _),
    "q_column_profile" -> (qColumnProfile _),
    "q_scd2" -> (qScd2 _),
    "q_skyline" -> (qSkyline _),
    "q_quantiles" -> (qQuantiles _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_json_extract" -> (qJsonExtract _),
    "q_deterministic_shuffle" -> (qDeterministicShuffle _),
    "q_shuffle_rank" -> (qShuffleRank _),
    "q_salted_join" -> (qSaltedJoin _),
    "q_cyclic_index" -> (qCyclicIndex _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_window_ranks" -> (qWindowRanks _),
    "q_window_distinct" -> (qWindowDistinct _),
    "q_funnel" -> (qFunnel _),
  )

  val oracle: Map[String, String] = Map(
    "q_string_agg" -> qStringAggSql,
    "q_band_join" -> qBandJoinSql,
    "q_multi_count" -> qMultiCountSql,
    "q_grouping_id" -> qGroupingIdSql,
    "q_percentile_disc" -> qPercentileDiscSql,
    "q_hopping" -> qHoppingSql,
    "q_incr_agg" -> qIncrAggSql,
    "q_column_profile" -> qColumnProfileSql,
    "q_scd2" -> qScd2Sql,
    "q_skyline" -> qSkylineSql,
    "q_quantiles" -> qQuantilesSql,
    "q_cube" -> qCubeSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_deterministic_shuffle" -> qDeterministicShuffleSql,
    "q_shuffle_rank" -> qShuffleRankSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_cyclic_index" -> qCyclicIndexSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_window_ranks" -> qWindowRanksSql,
    "q_window_distinct" -> qWindowDistinctSql,
    "q_funnel" -> qFunnelSql,
  )
}
