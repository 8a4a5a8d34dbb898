package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsOfJoin
import graft.queries.Exact._

/** Time-series / temporal-alignment operator surface (SURVEY §2.3 as-of
  * join, §2.5 windows & pad/clip, §2.7 union, §2.8 calendar + map
  * lookup, §2.10 month-spine default).
  *
  * The events table stands in for the observations table: user_id ≈
  * pixel/cell id, ts ≈ image timestamp, event_type ≈ source/band,
  * value ≈ band value.
  */
object TimeSeriesQueries {

  /** Nearest-in-time as-of join (dynamicworld.py:108-137): for each
    * (user, month) anchor at the month midpoint, the 'view' event
    * closest in time within the reference's 15-day tolerance. */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val spine = ev.select(col("user_id"), date_trunc("month", col("ts")).as("month_start"))
      .distinct()
      .withColumn("month_mid", col("month_start") + expr("INTERVAL 14 DAYS"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOfJoin.nearest(spine, views, Seq("user_id"),
        anchorTs = "month_mid", sourceTs = "ts",
        toleranceMs = 1296000000L, tieBreak = "event_id")
      .select(col("user_id"),
              date_format(col("month_start"), "yyyy-MM").as("month"),
              col("event_id").as("nearest_event"),
              col("value").as("nearest_value"),
              col("dist"))
  }

  val qAsofNearestSql: String =
    """WITH spine AS (
      |  SELECT DISTINCT user_id, date_trunc('month', ts) AS month_start FROM events),
      |cand AS (
      |  SELECT s.user_id, s.month_start, e.event_id, e.value,
      |    abs(epoch_ms(e.ts) - epoch_ms(s.month_start + INTERVAL 14 DAY)) AS dist,
      |    ROW_NUMBER() OVER (PARTITION BY s.user_id, s.month_start
      |      ORDER BY abs(epoch_ms(e.ts) - epoch_ms(s.month_start + INTERVAL 14 DAY)) ASC NULLS LAST,
      |               e.event_id ASC NULLS LAST) AS rk
      |  FROM spine s LEFT JOIN events e
      |    ON s.user_id = e.user_id AND e.event_type = 'view'
      |   AND abs(epoch_ms(e.ts) - epoch_ms(s.month_start + INTERVAL 14 DAY)) <= 1296000000)
      |SELECT user_id, strftime(month_start, '%Y-%m') AS month,
      |       event_id AS nearest_event, value AS nearest_value, dist
      |FROM cand WHERE rk = 1""".stripMargin

  /** Month-spine left join + coalesce — the reference's empty-window
    * sentinel default (`ee.Algorithms.If(size().gt(0), median, default)`,
    * composite.py:251-256) as a pure plan: every (user, month) gets a
    * row, missing aggregates become 0 (SURVEY §4 row 4). */
  def qMonthSpine(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    val months = ev.select(date_format(col("ts"), "yyyy-MM").as("month")).distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(dsum(col("value")).as("s"), count(lit(1)).as("c"))
    users.crossJoin(months)
      .join(purchases, Seq("user_id", "month"), "left")
      .select(col("user_id"), col("month"),
              coalesce(col("s"), lit(0.0)).as("purchase_value"),
              coalesce(col("c"), lit(0L)).as("n_purchases"))
  }

  val qMonthSpineSql: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |m AS (SELECT DISTINCT strftime(ts, '%Y-%m') AS month FROM events),
       |p AS (SELECT user_id, strftime(ts, '%Y-%m') AS month,
       |             ${dsumSql("value")} AS s, COUNT(*) AS c
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
       |SELECT u.user_id, m.month,
       |       COALESCE(p.s, 0.0) AS purchase_value,
       |       COALESCE(p.c, 0) AS n_purchases
       |FROM u CROSS JOIN m
       |LEFT JOIN p ON p.user_id = u.user_id AND p.month = m.month""".stripMargin

  /** Timestep pad/clip to a fixed length of 12 (dw.py:14-29 pad_array:
    * repeat the first timestep to pad, truncate if long), then
    * positional explode back to rows — exercising the nested-array ↔
    * exploded-layout conversion (SURVEY §7.3 hard-part 5). */
  def qPadClip(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("s"))
      .withColumn("arr", expr("transform(s, x -> x.value)"))
      .withColumn("padded",
        when(size(col("arr")) < 12,
          concat(col("arr"), expr("array_repeat(arr[0], 12 - size(arr))")))
        .otherwise(slice(col("arr"), 1, 12)))
      .select(col("user_id"), col("month"), posexplode(col("padded")).as(Seq("pos", "v")))
  }

  val qPadClipSql: String =
    """WITH g AS (
      |  SELECT user_id, strftime(ts, '%Y-%m') AS month,
      |         list(value ORDER BY ts, event_id) AS arr
      |  FROM events GROUP BY 1, 2),
      |p AS (
      |  SELECT user_id, month,
      |    CASE WHEN len(arr) < 12
      |         THEN list_concat(arr, list_transform(range(12 - len(arr)), i -> arr[1]))
      |         ELSE list_slice(arr, 1, 12) END AS padded
      |  FROM g)
      |SELECT user_id, month, r['pos'] AS pos, r['v'] AS v FROM (
      |  SELECT user_id, month,
      |         unnest(list_transform(range(12), i -> {'pos': i, 'v': padded[i+1]})) AS r
      |  FROM p)""".stripMargin

  /** Multi-sensor union — the Landsat 4+5+7+8+9 `merge` chain
    * (preprocessing.py:110-111): per-sensor subsets renamed to a common
    * schema, unioned, then composited. */
  def qUnionSensors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def sensor(t: String, name: String): DataFrame =
      ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts"), col("value").as("reading"),
                lit(name).as("sensor"))
    sensor("click", "c_sensor")
      .unionByName(sensor("view", "v_sensor"))
      .unionByName(sensor("purchase", "p_sensor"))
      .groupBy(col("user_id"), col("sensor"))
      .agg(dsum(col("reading")).as("sum_reading"), count(lit(1)).as("n"))
  }

  val qUnionSensorsSql: String =
    s"""WITH merged AS (
       |  SELECT user_id, ts, value AS reading, 'c_sensor' AS sensor FROM events WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT user_id, ts, value AS reading, 'v_sensor' AS sensor FROM events WHERE event_type = 'view'
       |  UNION ALL
       |  SELECT user_id, ts, value AS reading, 'p_sensor' AS sensor FROM events WHERE event_type = 'purchase')
       |SELECT user_id, sensor, ${dsumSql("reading")} AS sum_reading, COUNT(*) AS n
       |FROM merged GROUP BY user_id, sensor""".stripMargin

  /** Broadcast map lookup with default — `CLASSES_CODES.map` /
    * `remap(from, to, default)` (monthly.py:684; preprocessing.py:57):
    * a map literal evaluated per row, unknown keys → sentinel 9. */
  def qMapLookup(spark: SparkSession, dir: String): DataFrame = {
    val codeMap = map(
      lit("click"), lit(0), lit("view"), lit(1), lit("purchase"), lit(2))
    Tables.events(spark, dir)
      .withColumn("code", coalesce(element_at(codeMap, col("event_type")), lit(9)))
      .groupBy(col("code"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
  }

  val qMapLookupSql: String =
    """SELECT CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
      |            WHEN 'purchase' THEN 2 ELSE 9 END AS code,
      |       COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  /** Calendar-part filter + per-day aggregate —
    * `ee.Filter.calendarRange(year/month)` (height.py:232-233) and
    * hour-of-day predicates as plain date-part arithmetic. */
  def qCalendar(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(year(col("ts")) === 2024 &&
              month(col("ts")).isin(1, 2) &&
              hour(col("ts")).between(6, 18))
      .groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"),
               dayofmonth(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), dmean(col("value")).as("avg_value"))
  }

  val qCalendarSql: String =
    s"""SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d,
       |  COUNT(*) AS n, ${dmeanSql("value")} AS avg_value
       |FROM events
       |WHERE year(ts) = 2024 AND month(ts) IN (1, 2)
       |  AND hour(ts) BETWEEN 6 AND 18
       |GROUP BY 1, 2, 3""".stripMargin

  /** Gaps-and-islands sessionization — the batch/relational dual of
    * the streaming session_window (SURVEY §2.10): a session breaks
    * after 30 minutes of inactivity; session id is the running count
    * of breaks. Two windows over the same (user, time) ordering —
    * one shuffle. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1)
        .otherwise(0))
      .withColumn("session_id", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"),
        unix_millis(max(col("ts"))).-(unix_millis(min(col("ts")))).as("duration_ms"))
  }

  val qSessionizeSql: String =
    s"""WITH b AS (
       |  SELECT user_id, ts, event_id, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
       |         ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, value, ts,
       |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM b)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  ${dsumSql("value")} AS session_value,
       |  epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS duration_ms
       |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Time-range rolling window (SURVEY §2.5 frame-spec row): per
    * event, the exact decimal sum and count of the same user's events
    * in the preceding 7 days — RANGE frame over event time, not a row
    * count, so irregular sampling is handled correctly. One shuffle
    * on the user key. */
  def qRollingRange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"))
      .rangeBetween(-7L * 24 * 3600 * 1000, 0L)
    Tables.events(spark, dir)
      .filter(col("user_id") < 5)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("rolling_7d_sum", sum(col("value").cast(Dec)).over(w).cast("double"))
      .withColumn("rolling_7d_n", count(lit(1)).over(w))
      .select("user_id", "event_id", "value", "rolling_7d_sum", "rolling_7d_n")
  }

  val qRollingRangeSql: String =
    """SELECT user_id, event_id, value,
      |  CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS rolling_7d_sum,
      |  COUNT(*) OVER w AS rolling_7d_n
      |FROM events WHERE user_id < 5
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
      |             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Bounded-window exponential moving average (decay 0.9 over the
    * last 20 observations) per user — the smoothing/forecast-baseline
    * step of the reference's per-pixel temporal compositing family
    * (a monthly median is the robust composite; EWMA is the recency-
    * weighted one). ewma_i = Σ_{k=0..19} w_k·x_{i−k} / Σ w_k with
    * w_k = 0.9^k.
    *
    * Cross-engine determinism, three layers: (1) the weights are NOT
    * pow(0.9,k) — libm pow is not correctly rounded — but a driver-
    * computed repeated-product table whose exact doubles embed as
    * %.17e literals in the oracle (bit-identical by construction);
    * (2) each weighted term floor-quantizes at 1e-6 to a long before
    * the variable-width sum (the Exact.qsum rule); (3) the final
    * ratio is one IEEE divide of two longs-as-doubles. Shape at
    * scale: row indexing is a per-user window (never global); the
    * 20-row band is an equi-join on user_id with a range predicate
    * on the index plus a broadcast 20-row weight join — shuffle only
    * on user_id, fan-out capped at 20 per row by construction. */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = ewmaWeights.zipWithIndex.map { case (w, k) => (k, w) }
    val wdf = spark.createDataFrame(weights).toDF("k", "w")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val idx = Tables.events(spark, dir)
      .where(col("user_id") < 50)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("i", row_number().over(w).cast("long"))
    val a = idx.select(col("user_id"), col("i"), col("event_id"))
    val b = idx.select(col("user_id"), col("i").as("j"), col("value").as("xj"))
    a.join(b, Seq("user_id"))
      .where(col("j") >= col("i") - 19 && col("j") <= col("i"))
      .join(broadcast(wdf), (col("i") - col("j")).cast("int") === col("k"))
      .groupBy(col("user_id"), col("i"), col("event_id"))
      .agg(
        count(lit(1)).as("n_window"),
        sum(floor(col("xj") * col("w") * lit(1000000.0)).cast("long")).as("numq"),
        sum(floor(col("w") * lit(1000000.0)).cast("long")).as("denq"))
      .withColumn("ewma", col("numq").cast("double") / col("denq").cast("double"))
      .select("user_id", "i", "event_id", "n_window", "ewma")
  }

  /** w_k = 0.9^k by repeated IEEE multiplication — exact doubles,
    * shared by the engine (as literals) and the oracle (as %.17e
    * text, which parses back to the identical bits). */
  private val ewmaWeights: Seq[Double] =
    Iterator.iterate(1.0)(_ * 0.9).take(20).toSeq

  val qEwmaSql: String = {
    val vals = ewmaWeights.zipWithIndex
      .map { case (w, k) => f"($k, $w%.17e)" }.mkString(", ")
    s"""WITH wt(k, w) AS (VALUES $vals),
       |idx AS (
       |  SELECT user_id, event_id, value,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS BIGINT) AS i
       |  FROM events WHERE user_id < 50)
       |SELECT a.user_id, a.i, a.event_id, COUNT(*) AS n_window,
       |  CAST(SUM(CAST(FLOOR(b.value * wt.w * 1e6) AS BIGINT)) AS DOUBLE)
       |    / CAST(SUM(CAST(FLOOR(wt.w * 1e6) AS BIGINT)) AS DOUBLE) AS ewma
       |FROM idx a
       |JOIN idx b ON a.user_id = b.user_id
       |  AND b.i BETWEEN a.i - 19 AND a.i
       |JOIN wt ON CAST(a.i - b.i AS INTEGER) = wt.k
       |GROUP BY a.user_id, a.i, a.event_id""".stripMargin
  }

  /** Last-observation-carried-forward gap fill — the imputation the
    * reference's month-spine sentinel default (composite.py:251-256)
    * and nearest-image fallback (dw.py:108-137) approximate: every
    * (user, day) cell gets the most recent observed daily mean at
    * or before it. The spine is the qMonthSpine cross of users ×
    * days; the fill is ONE user-partitioned ordered window with
    * `last(_, ignoreNulls)` — no self-join, no global window, shuffle
    * keyed on user_id only (a 1000-executor cluster fills each user's
    * bounded daily series locally). Leading gaps stay NULL (nothing
    * to carry); `was_observed` marks fills apart from observations. */
  def qLocf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day")).distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(dmean(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    users.crossJoin(days)
      .join(purchases, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("filled"),
              col("v").isNotNull.as("was_observed"))
  }

  val qLocfSql: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |m AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events),
       |p AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
       |             ${dmeanSql("value")} AS v
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |spine AS (
       |  SELECT u.user_id, m.day, p.v
       |  FROM u CROSS JOIN m
       |  LEFT JOIN p ON p.user_id = u.user_id AND p.day = m.day)
       |SELECT user_id, day,
       |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       |  v IS NOT NULL AS was_observed
       |FROM spine""".stripMargin

  /** Linear interpolation of interior gaps — the step past LOCF: a
    * missing day between two observed ones gets the straight-line
    * value between them, leading/trailing gaps extend the nearest
    * observation. Four ignore-nulls windows (prev/next value and
    * day index) over the user-keyed spine — still no self-join; the
    * day index is the exact integer epoch-day, so the interpolation
    * weight is one IEEE divide of two exact integer differences,
    * identical on both engines. */
  def qInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val users = ev.select(col("user_id")).distinct()
    val days = ev.select(date_format(col("ts"), "yyyy-MM-dd").as("day")).distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(dmean(col("value")).as("v"))
    val idx = datediff(to_date(col("day")), lit("1970-01-01").cast("date")).cast("long")
    val back = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsI = when(col("v").isNotNull, col("i"))
    users.crossJoin(days)
      .join(purchases, Seq("user_id", "day"), "left")
      .withColumn("i", idx)
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pi", last(obsI, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("ni", first(obsI, ignoreNulls = true).over(fwd))
      .withColumn("interp",
        when(col("v").isNotNull, col("v"))
        .when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv") + (col("nv") - col("pv")) *
            ((col("i") - col("pi")).cast("double") /
             (col("ni") - col("pi")).cast("double")))
        .when(col("pv").isNotNull, col("pv"))
        .otherwise(col("nv")))
      .select(col("user_id"), col("day"), col("interp"),
              col("v").isNotNull.as("was_observed"))
  }

  val qInterpolateSql: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |m AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events),
       |p AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
       |             ${dmeanSql("value")} AS v
       |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |spine AS (
       |  SELECT u.user_id, m.day, p.v,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(m.day AS DATE)) AS BIGINT) AS i
       |  FROM u CROSS JOIN m
       |  LEFT JOIN p ON p.user_id = u.user_id AND p.day = m.day),
       |fill AS (
       |  SELECT user_id, day, v, i,
       |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
       |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
       |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
       |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
       |  FROM spine)
       |SELECT user_id, day,
       |  CASE WHEN v IS NOT NULL THEN v
       |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
       |         pv + (nv - pv) * (CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
       |       WHEN pv IS NOT NULL THEN pv
       |       ELSE nv END AS interp,
       |  v IS NOT NULL AS was_observed
       |FROM fill""".stripMargin

  /** Autocorrelation function at lags 1–3 over each user's daily
    * mean series — the seasonality probe a monthly-composite pipeline
    * (monthly.py:722-735) runs before choosing its window length.
    * acf_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², computed in one
    * user-keyed window pass: the three lags come from three `lead`s
    * over the same ordered window (one shuffle), the per-user mean
    * and denominator from the same unordered partition frame, and an
    * unpivot fans the lags out AFTER the window so the series is read
    * once. Both sums floor-quantize products to longs (the Exact rule)
    * so partition order can't move a ulp; the final ratio is one
    * integer-over-integer IEEE divide. */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(dmean(col("value")).as("v"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("user_id"))
    val base = daily
      .withColumn("xbar",
        sum(col("v").cast(Dec)).over(wAll).cast("double") /
          count(lit(1)).over(wAll))
      .withColumn("denq",
        sum(floor((col("v") - col("xbar")) * (col("v") - col("xbar")) *
          lit(1000000.0)).cast("long")).over(wAll))
      .withColumn("l1", lead(col("v"), 1).over(wOrd))
      .withColumn("l2", lead(col("v"), 2).over(wOrd))
      .withColumn("l3", lead(col("v"), 3).over(wOrd))
    base.select(col("user_id"), col("v"), col("xbar"), col("denq"),
        expr("stack(3, 1, l1, 2, l2, 3, l3)").as(Seq("lag", "lv")))
      .filter(col("lv").isNotNull)
      .groupBy(col("user_id"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(floor((col("v") - col("xbar")) * (col("lv") - col("xbar")) *
          lit(1000000.0)).cast("long")).as("numq"),
        first(col("denq")).as("dq"))
      .filter(col("dq") > 0L)
      .withColumn("acf", col("numq").cast("double") / col("dq").cast("double"))
      .select(col("user_id"), col("lag").cast("int").as("lag"),
              col("n_pairs"), col("acf"))
  }

  val qAcfSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
       |         ${dmeanSql("value")} AS v
       |  FROM events GROUP BY 1, 2),
       |base AS (
       |  SELECT user_id, day, v,
       |    CAST(SUM(CAST(v AS DECIMAL(25,6))) OVER (PARTITION BY user_id) AS DOUBLE)
       |      / COUNT(*) OVER (PARTITION BY user_id) AS xbar,
       |    lead(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS l1,
       |    lead(v, 2) OVER (PARTITION BY user_id ORDER BY day) AS l2,
       |    lead(v, 3) OVER (PARTITION BY user_id ORDER BY day) AS l3
       |  FROM daily),
       |den AS (
       |  SELECT user_id, day, v, xbar, l1, l2, l3,
       |    SUM(CAST(FLOOR((v - xbar) * (v - xbar) * 1000000.0) AS BIGINT))
       |      OVER (PARTITION BY user_id) AS denq
       |  FROM base),
       |pairs AS (
       |  SELECT user_id, v, xbar, denq, lag, lv FROM (
       |    SELECT user_id, v, xbar, denq,
       |      unnest([{'lag': 1, 'lv': l1}, {'lag': 2, 'lv': l2},
       |              {'lag': 3, 'lv': l3}], recursive := true)
       |    FROM den)
       |  WHERE lv IS NOT NULL)
       |SELECT user_id, CAST(lag AS INT) AS lag, COUNT(*) AS n_pairs,
       |  CAST(SUM(CAST(FLOOR((v - xbar) * (lv - xbar) * 1000000.0) AS BIGINT)) AS DOUBLE)
       |    / CAST(ANY_VALUE(denq) AS DOUBLE) AS acf
       |FROM pairs
       |GROUP BY user_id, lag
       |HAVING ANY_VALUE(denq) > 0""".stripMargin

  /** Backward-only as-of join (pandas merge_asof / kdb aj default
    * direction): each purchase picks up the same user's LAST click
    * strictly before it — not the nearest in either direction
    * (q_asof_nearest's semantics). No join at all: the events merge
    * per user in ONE ordered window and an ignore-nulls `last` over
    * the conditional click columns carries the state — the LOCF-join
    * fusion that replaces a per-anchor subquery with a single keyed
    * pass. Strictly-before comes from the 1-preceding frame end.
    * Purchases with no prior click keep NULLs (the left-join
    * contract). Integer-microsecond gap arithmetic. */
  def qAsofBackward(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("click_t", when(col("event_type") === "click", col("tus")))
      .withColumn("click_v", when(col("event_type") === "click", col("value")))
      .withColumn("last_click_t", last(col("click_t"), ignoreNulls = true).over(w))
      .withColumn("last_click_v", last(col("click_v"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value").as("purchase_value"),
        col("last_click_v"),
        (col("tus") - col("last_click_t")).as("gap_us"))
  }

  val qAsofBackwardSql: String =
    """WITH m AS (
      |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tus,
      |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_t,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_v
      |  FROM events)
      |SELECT user_id, event_id, value AS purchase_value,
      |  last_click_v, tus - last_click_t AS gap_us
      |FROM m WHERE event_type = 'purchase'""".stripMargin

  /** SCD type-1 MERGE classification — the CDC upsert readout: the
    * standing dimension (each user's latest state from days ≤ 14)
    * merges with the update batch (days ≥ 15), and every output row
    * is classified inserted / updated / unchanged / retained with its
    * final state — the audit a MERGE INTO statement leaves behind.
    * Two keyed latest-row windows + one full-outer merge; all
    * comparisons exact. */
  def qMergeScd1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def latest(part: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus").desc, col("event_id").desc)
      part.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("user_id"), col("event_type"), col("value"))
    }
    val ev = Tables.events(spark, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("d", dayofmonth(col("ts")))
    val base = latest(ev.filter(col("d") <= 14))
      .select(col("user_id"), col("event_type").as("base_type"),
        col("value").as("base_value"))
    val upd = latest(ev.filter(col("d") >= 15))
      .select(col("user_id"), col("event_type").as("new_type"),
        col("value").as("new_value"))
    base.join(upd, Seq("user_id"), "full_outer")
      .withColumn("action",
        when(col("base_type").isNull, lit("inserted"))
        .when(col("new_type").isNull, lit("retained"))
        .when(col("new_type") === col("base_type") &&
              col("new_value") === col("base_value"), lit("unchanged"))
        .otherwise(lit("updated")))
      .select(col("user_id"), col("action"),
        coalesce(col("new_type"), col("base_type")).as("final_type"),
        coalesce(col("new_value"), col("base_value")).as("final_value"))
  }

  val qMergeScd1Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, value, event_id, epoch_us(ts) AS tus,
      |    day(ts) AS d
      |  FROM events),
      |base AS (
      |  SELECT user_id, event_type AS base_type, value AS base_value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY tus DESC, event_id DESC) AS rk
      |    FROM ev WHERE d <= 14) WHERE rk = 1),
      |upd AS (
      |  SELECT user_id, event_type AS new_type, value AS new_value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY tus DESC, event_id DESC) AS rk
      |    FROM ev WHERE d >= 15) WHERE rk = 1)
      |SELECT COALESCE(b.user_id, u.user_id) AS user_id,
      |  CASE WHEN b.base_type IS NULL THEN 'inserted'
      |       WHEN u.new_type IS NULL THEN 'retained'
      |       WHEN u.new_type = b.base_type AND u.new_value = b.base_value
      |         THEN 'unchanged'
      |       ELSE 'updated' END AS action,
      |  COALESCE(u.new_type, b.base_type) AS final_type,
      |  COALESCE(u.new_value, b.base_value) AS final_value
      |FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_backward" -> (qAsofBackward _),
    "q_merge_scd1" -> (qMergeScd1 _),
    "q_locf" -> (qLocf _),
    "q_interpolate" -> (qInterpolate _),
    "q_acf" -> (qAcf _),
    "q_ewma" -> (qEwma _),
    "q_sessionize" -> (qSessionize _),
    "q_rolling_range" -> (qRollingRange _),
    "q_asof_nearest" -> (qAsofNearest _),
    "q_month_spine" -> (qMonthSpine _),
    "q_pad_clip" -> (qPadClip _),
    "q_union_sensors" -> (qUnionSensors _),
    "q_map_lookup" -> (qMapLookup _),
    "q_calendar" -> (qCalendar _),
  )

  val oracle: Map[String, String] = Map(
    "q_asof_backward" -> qAsofBackwardSql,
    "q_merge_scd1" -> qMergeScd1Sql,
    "q_locf" -> qLocfSql,
    "q_interpolate" -> qInterpolateSql,
    "q_acf" -> qAcfSql,
    "q_ewma" -> qEwmaSql,
    "q_sessionize" -> qSessionizeSql,
    "q_rolling_range" -> qRollingRangeSql,
    "q_asof_nearest" -> qAsofNearestSql,
    "q_month_spine" -> qMonthSpineSql,
    "q_pad_clip" -> qPadClipSql,
    "q_union_sensors" -> qUnionSensorsSql,
    "q_map_lookup" -> qMapLookupSql,
    "q_calendar" -> qCalendarSql,
  )
}
