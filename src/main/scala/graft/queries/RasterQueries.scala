package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Reproject
import graft.queries.Exact._

/** Raster-semantics operators in relational form (SURVEY §2.2 erosion
  * mask / §2.8 terrain, §2.3 spatial join; §7.3 hard-part 1). The
  * events table supplies a synthetic grid: x = user_id,
  * y = day-of-month, cell value = min event value.
  */
object RasterQueries {

  /** 3×3 focal (neighborhood) minimum — the reference's L7 scan-line
    * erosion `mask().reduce(min).focal_min(...)`
    * (preprocessing.py:66) and the shape of terrain slope/aspect
    * stencils (monthly.py:340-344). Scatter form: each cell
    * contributes to its 9 neighbors through a broadcast 9-row offset
    * table, then one groupBy on the target cell — a single shuffle on
    * the cell key, no windowed self-join. At 100 TB the grid
    * partitions by tile and offsets stay tile-local (halo cells are
    * the only cross-partition traffic). */
  def qFocalMin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val offsets = (for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)).toDF("dx", "dy")
    val scattered = grid.crossJoin(broadcast(offsets))
      .select((col("x") + col("dx")).as("tx"), (col("y") + col("dy")).as("ty"), col("v"))
      .groupBy(col("tx"), col("ty"))
      .agg(min(col("v")).as("focal_min"), count(lit(1)).as("n_contrib"))
    grid.join(scattered, col("x") === col("tx") && col("y") === col("ty"))
      .select(col("x"), col("y"), col("v"), col("focal_min"), col("n_contrib"))
  }

  val qFocalMinSql: String =
    """WITH grid AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |offsets(dx, dy) AS (
      |  VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
      |scattered AS (
      |  SELECT g.x + o.dx AS tx, g.y + o.dy AS ty,
      |         MIN(v) AS focal_min, COUNT(*) AS n_contrib
      |  FROM grid g CROSS JOIN offsets o
      |  GROUP BY 1, 2)
      |SELECT g.x, g.y, g.v, s.focal_min, s.n_contrib
      |FROM grid g JOIN scattered s ON g.x = s.tx AND g.y = s.ty""".stripMargin

  /** Point-in-rectangle spatial join with grid-bin blocking — the
    * polygon→pixel rasterization join (monthly.py:499) reduced to its
    * relational core: rectangles explode to the x-bins they cover
    * (bin width 4), points bin the same way, candidates come from the
    * bin equi-join, the exact containment predicate filters. At 100 TB
    * the bin is the shuffle/bucketing key; no all-pairs comparison
    * ever happens. */
  def qSpatialJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rects = Seq(
      (1L, 0L, 5L, 0.0, 120.0), (2L, 3L, 9L, 50.0, 300.0),
      (3L, 8L, 14L, 0.0, 60.0), (4L, 12L, 15L, 100.0, 500.0),
    ).toDF("rect_id", "xmin", "xmax", "ymin", "ymax")
    val rectBins = rects
      .withColumn("bin", explode(expr("sequence(xmin div 4, xmax div 4)")))
    val points = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id").as("px"), col("value").as("py"))
      .withColumn("bin", expr("px div 4"))
    points.join(broadcast(rectBins), "bin")
      .filter(col("px").between(col("xmin"), col("xmax")) &&
              col("py").between(col("ymin"), col("ymax")))
      .groupBy(col("rect_id"))
      .agg(count(lit(1)).as("n_points"), dsum(col("py")).as("sum_py"))
  }

  val qSpatialJoinSql: String =
    s"""WITH rects(rect_id, xmin, xmax, ymin, ymax) AS (
       |  VALUES (1, 0, 5, 0.0, 120.0), (2, 3, 9, 50.0, 300.0),
       |         (3, 8, 14, 0.0, 60.0), (4, 12, 15, 100.0, 500.0)),
       |rect_bins AS (
       |  SELECT rect_id, xmin, xmax, ymin, ymax, unnest(range(xmin // 4, xmax // 4 + 1)) AS bin
       |  FROM rects),
       |points AS (
       |  SELECT event_id, user_id AS px, value AS py, user_id // 4 AS bin FROM events)
       |SELECT r.rect_id, COUNT(*) AS n_points, ${dsumSql("p.py")} AS sum_py
       |FROM points p JOIN rect_bins r ON p.bin = r.bin
       |WHERE p.px BETWEEN r.xmin AND r.xmax AND p.py BETWEEN r.ymin AND r.ymax
       |GROUP BY r.rect_id""".stripMargin

  /** cos(14.7°) — the Senegal-ish reference latitude, embedded as the
    * same full-precision literal in both engines so no trig runs
    * in-engine. */
  private val cosRef = math.cos(14.7 * math.Pi / 180.0)

  /** Grid-cell binning + bounded-radius spatial filter
    * (`filterBounds`/`clip`, SURVEY §2.2): synthetic lat/lon from
    * events, 5° grid cell ids (the partition-pruning key), and an
    * equirectangular distance filter around a fixed center — distance
    * math is mul/add/sqrt only, so the oracle hash-matches. */
  def qGeoCells(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoOps
    val pts = Tables.events(spark, dir)
      .select(col("event_id"),
        ((col("user_id") - 7.5) * 2).as("lat"),
        ((col("value") % 180) - 90.0).as("lon"))
    pts
      .withColumn("cell", GeoOps.gridCellId(col("lat"), col("lon"), 5.0))
      .withColumn("dist_km",
        GeoOps.equirectKm(col("lat"), col("lon"), lit(14.7), lit(-14.5), cosRef))
      .filter(col("dist_km") < 4000.0)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), min(col("dist_km")).as("min_dist"),
        max(col("dist_km")).as("max_dist"))
  }

  val qGeoCellsSql: String = {
    // force DOUBLE literals in DuckDB (a bare `111.32` parses as
    // DECIMAL, whose decimal→double conversion can differ by 1 ulp
    // from a direct double parse); the dx factor is the precomputed
    // Scala product so neither engine multiplies constants itself.
    val dxf = (GeoOps2KmPerDegLat * cosRef).toString + "e0"
    s"""WITH pts AS (
       |  SELECT event_id, (user_id - 7.5) * 2 AS lat, (value % 180) - 90.0 AS lon
       |  FROM events),
       |d AS (
       |  SELECT
       |    (CAST(FLOOR(lat / 5.0) AS BIGINT) + 1048576) * 4194304
       |      + (CAST(FLOOR(lon / 5.0) AS BIGINT) + 1048576) AS cell,
       |    sqrt(((14.7e0 - lat) * 1.1132e2) * ((14.7e0 - lat) * 1.1132e2)
       |       + ((-14.5e0 - lon) * $dxf) * ((-14.5e0 - lon) * $dxf))
       |      AS dist_km
       |  FROM pts)
       |SELECT cell, COUNT(*) AS n, MIN(dist_km) AS min_dist, MAX(dist_km) AS max_dist
       |FROM d WHERE dist_km < 4000.0
       |GROUP BY cell""".stripMargin
  }
  private def GeoOps2KmPerDegLat = graft.functions.GeoOps.KmPerDegLat

  /** Bilinear resample (SURVEY §2.8 resample row, §7.3 hard-part 1):
    * `.resample("bilinear").reproject(scale=10)` (monthly.py:334-337)
    * as a pure relational plan — target pixels explode to their four
    * source corners with analytically generated weights, an equi-join
    * fetches corner values, and a conditional-aggregation pivot
    * recombines them in a FIXED expression order (c00+c10+c01+c11),
    * so the result is bit-deterministic with no quantization. Only
    * interior targets (all 4 corners present) are emitted, matching
    * raster resampling's valid region. One shuffle, on the corner
    * cell key. */
  def qBilinearResample(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val targets = spark.range(0, 36).toDF("tx")
      .crossJoin(spark.range(0, 60).toDF("ty"))
      .withColumn("u", col("tx") * 0.4)
      .withColumn("w", col("ty") * 0.4)
      .withColumn("x0", floor(col("u")).cast("long"))
      .withColumn("y0", floor(col("w")).cast("long"))
      .withColumn("fx", col("u") - col("x0"))
      .withColumn("fy", col("w") - col("y0"))
    val corners = targets
      .withColumn("c", explode(expr(
        "transform(sequence(0, 3), i -> struct(i % 2 AS dx, i div 2 AS dy))")))
      .select(col("tx"), col("ty"), col("fx"), col("fy"),
        (col("x0") + col("c.dx")).as("x"), (col("y0") + col("c.dy")).as("y"),
        col("c.dx").as("dx"), col("c.dy").as("dy"))
      .withColumn("wt",
        (when(col("dx") === 1, col("fx")).otherwise(lit(1.0) - col("fx"))) *
        (when(col("dy") === 1, col("fy")).otherwise(lit(1.0) - col("fy"))))
    corners.join(src, Seq("x", "y"))
      .groupBy(col("tx"), col("ty"))
      .agg(
        max(when(col("dx") === 0 && col("dy") === 0, col("wt") * col("v"))).as("c00"),
        max(when(col("dx") === 1 && col("dy") === 0, col("wt") * col("v"))).as("c10"),
        max(when(col("dx") === 0 && col("dy") === 1, col("wt") * col("v"))).as("c01"),
        max(when(col("dx") === 1 && col("dy") === 1, col("wt") * col("v"))).as("c11"),
        count(lit(1)).as("found"))
      .filter(col("found") === 4)
      .select(col("tx"), col("ty"),
        (col("c00") + col("c10") + col("c01") + col("c11")).as("resampled"))
  }

  val qBilinearResampleSql: String =
    """WITH src AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |targets AS (
      |  SELECT tx, ty, tx * 0.4e0 AS u, ty * 0.4e0 AS w
      |  FROM (SELECT unnest(range(36)) AS tx), (SELECT unnest(range(60)) AS ty)),
      |t2 AS (
      |  SELECT tx, ty, u, w,
      |    CAST(FLOOR(u) AS BIGINT) AS x0, CAST(FLOOR(w) AS BIGINT) AS y0,
      |    u - CAST(FLOOR(u) AS BIGINT) AS fx, w - CAST(FLOOR(w) AS BIGINT) AS fy
      |  FROM targets),
      |corners AS (
      |  SELECT tx, ty, fx, fy,
      |    x0 + (i % 2) AS x, y0 + (i // 2) AS y, i % 2 AS dx, i // 2 AS dy,
      |    (CASE WHEN i % 2 = 1 THEN fx ELSE 1.0e0 - fx END)
      |      * (CASE WHEN i // 2 = 1 THEN fy ELSE 1.0e0 - fy END) AS wt
      |  FROM t2, (SELECT unnest(range(4)) AS i)),
      |agg AS (
      |  SELECT tx, ty,
      |    MAX(CASE WHEN dx = 0 AND dy = 0 THEN wt * v END) AS c00,
      |    MAX(CASE WHEN dx = 1 AND dy = 0 THEN wt * v END) AS c10,
      |    MAX(CASE WHEN dx = 0 AND dy = 1 THEN wt * v END) AS c01,
      |    MAX(CASE WHEN dx = 1 AND dy = 1 THEN wt * v END) AS c11,
      |    COUNT(*) AS found
      |  FROM corners c JOIN src s ON c.x = s.x AND c.y = s.y
      |  GROUP BY 1, 2)
      |SELECT tx, ty, c00 + c10 + c01 + c11 AS resampled
      |FROM agg WHERE found = 4""".stripMargin

  /** Terrain gradients (`ee.Terrain.slope/aspect`,
    * monthly.py:340-344): central-difference dz/dx and dz/dy per
    * cell from the 4-neighbor stencil, plus the squared gradient
    * magnitude (slope = atan(|∇z|) is monotone in it; staying in
    * mul/add keeps the oracle bit-exact — no libm in-engine). Same
    * scatter/gather shape as focal-min: one shuffle on the cell key,
    * interior cells only. */
  def qTerrainGradient(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grid = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val offsets = Seq((-1, 0, "xm"), (1, 0, "xp"), (0, -1, "ym"), (0, 1, "yp"))
      .toDF("dx", "dy", "role")
    val scattered = grid.crossJoin(broadcast(offsets))
      .select((col("x") + col("dx")).as("tx"), (col("y") + col("dy")).as("ty"),
        col("role"), col("v"))
      .groupBy(col("tx"), col("ty"))
      .agg(
        max(when(col("role") === "xm", col("v"))).as("vxm"),
        max(when(col("role") === "xp", col("v"))).as("vxp"),
        max(when(col("role") === "ym", col("v"))).as("vym"),
        max(when(col("role") === "yp", col("v"))).as("vyp"),
        count(lit(1)).as("n"))
      .filter(col("n") === 4)
    grid.join(scattered, col("x") === col("tx") && col("y") === col("ty"))
      .select(col("x"), col("y"), col("v"),
        ((col("vxp") - col("vxm")) / 2.0).as("dzdx"),
        ((col("vyp") - col("vym")) / 2.0).as("dzdy"))
      .withColumn("grad_sq",
        col("dzdx") * col("dzdx") + col("dzdy") * col("dzdy"))
  }

  val qTerrainGradientSql: String =
    """WITH grid AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |offsets(dx, dy, role) AS (
      |  VALUES (-1, 0, 'xm'), (1, 0, 'xp'), (0, -1, 'ym'), (0, 1, 'yp')),
      |scattered AS (
      |  SELECT g.x + o.dx AS tx, g.y + o.dy AS ty,
      |    MAX(CASE WHEN o.role = 'xm' THEN v END) AS vxm,
      |    MAX(CASE WHEN o.role = 'xp' THEN v END) AS vxp,
      |    MAX(CASE WHEN o.role = 'ym' THEN v END) AS vym,
      |    MAX(CASE WHEN o.role = 'yp' THEN v END) AS vyp,
      |    COUNT(*) AS n
      |  FROM grid g CROSS JOIN offsets o
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) = 4)
      |SELECT g.x, g.y, g.v,
      |  (s.vxp - s.vxm) / 2.0 AS dzdx,
      |  (s.vyp - s.vym) / 2.0 AS dzdy,
      |  ((s.vxp - s.vxm) / 2.0) * ((s.vxp - s.vxm) / 2.0)
      |    + ((s.vyp - s.vym) / 2.0) * ((s.vyp - s.vym) / 2.0) AS grad_sq
      |FROM grid g JOIN scattered s ON g.x = s.tx AND g.y = s.ty""".stripMargin

  /** The full `ee.Terrain` surface on the same stencil: slope in
    * degrees, aspect as an azimuth clockwise from north (flat → 0),
    * hillshade 0–255 under EE's default sun (azimuth 270°, elevation
    * 45°). The trig goes through libm, whose last-ulp rounding
    * differs between JVM and DuckDB; flooring each output at 1e-6
    * (the q_unigram_typicality quantize-before-hash pattern) makes
    * those divergences vanish, so the query IS oracle-graded — the
    * un-quantized closures stay pinned by TerrainSpec's hand-computed
    * plane fixtures and the gradient feed by q_terrain_gradient. The
    * oracle embeds the JVM's exact sun-constant doubles (scientific
    * notation, so DuckDB parses them as DOUBLE not DECIMAL); the
    * remaining risk is a last-ulp libm difference landing exactly on
    * a 1e-6 floor boundary (~1e-8 per value — absent across all
    * three test scales). */
  def qTerrain(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TerrainOps
    def quant6(c: Column): Column =
      floor(c * lit(1000000.0)).cast("long").cast("double") / lit(1000000.0)
    qTerrainGradient(spark, dir)
      .withColumn("slope_deg", quant6(TerrainOps.slopeDeg(col("dzdx"), col("dzdy"))))
      .withColumn("aspect_deg", quant6(TerrainOps.aspectDeg(col("dzdx"), col("dzdy"))))
      .withColumn("hillshade", quant6(TerrainOps.hillshade(col("dzdx"), col("dzdy"))))
  }

  val qTerrainSql: String = {
    // identical doubles to TerrainOps.hillshade's JVM-computed
    // constants (zenith 45°, azimuth 270°), emitted in scientific
    // notation so DuckDB binds DOUBLE literals bit-equal to the JVM's
    val zen = math.toRadians(90.0 - 45.0)
    def d(v: Double): String = f"$v%.17e"
    val cosZen = d(math.cos(zen)); val sinZen = d(math.sin(zen))
    val sunAz = d(math.toRadians(270.0))
    val aspect =
      """CASE WHEN dzdx = 0 AND dzdy = 0 THEN 0.0
        |      ELSE CASE WHEN degrees(atan2(-dzdx, -dzdy)) < 0
        |                THEN degrees(atan2(-dzdx, -dzdy)) + 360.0
        |                ELSE degrees(atan2(-dzdx, -dzdy)) END END""".stripMargin
    def q6(expr: String): String =
      s"CAST(CAST(FLOOR(($expr) * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0"
    s"""WITH grid AS (
       |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
       |  FROM events GROUP BY 1, 2),
       |offsets(dx, dy, role) AS (
       |  VALUES (-1, 0, 'xm'), (1, 0, 'xp'), (0, -1, 'ym'), (0, 1, 'yp')),
       |scattered AS (
       |  SELECT g.x + o.dx AS tx, g.y + o.dy AS ty,
       |    MAX(CASE WHEN o.role = 'xm' THEN v END) AS vxm,
       |    MAX(CASE WHEN o.role = 'xp' THEN v END) AS vxp,
       |    MAX(CASE WHEN o.role = 'ym' THEN v END) AS vym,
       |    MAX(CASE WHEN o.role = 'yp' THEN v END) AS vyp,
       |    COUNT(*) AS n
       |  FROM grid g CROSS JOIN offsets o
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) = 4),
       |grad AS (
       |  SELECT g.x, g.y, g.v,
       |    (s.vxp - s.vxm) / 2.0 AS dzdx,
       |    (s.vyp - s.vym) / 2.0 AS dzdy,
       |    ((s.vxp - s.vxm) / 2.0) * ((s.vxp - s.vxm) / 2.0)
       |      + ((s.vyp - s.vym) / 2.0) * ((s.vyp - s.vym) / 2.0) AS grad_sq
       |  FROM grid g JOIN scattered s ON g.x = s.tx AND g.y = s.ty)
       |SELECT x, y, v, dzdx, dzdy, grad_sq,
       |  ${q6("degrees(atan(sqrt(dzdx * dzdx + dzdy * dzdy)))")} AS slope_deg,
       |  ${q6(s"($aspect)")} AS aspect_deg,
       |  ${q6(s"""255.0 * GREATEST(0.0,
       |    $cosZen * cos(atan(sqrt(dzdx * dzdx + dzdy * dzdy)))
       |    + $sinZen * sin(atan(sqrt(dzdx * dzdx + dzdy * dzdy)))
       |      * cos($sunAz - radians($aspect)))""".stripMargin)} AS hillshade
       |FROM grad""".stripMargin
  }

  /** Inverse-distance-weighted interpolation of scattered points onto
    * a regular target grid — the gridding step between the reference's
    * point extractions (preprocessing.py per-point series) and its
    * raster products: v(t) = Σ wᵢvᵢ / Σ wᵢ with wᵢ = 1/dᵢ² over
    * points within 300 km. The candidate generation is the standard
    * 3×3 grid-cell block (each target probes its 5° cell and the 8
    * neighbors — complete because the radius is under one cell span),
    * so the join keys on the cell, never all pairs; the brute-force
    * DuckDB oracle proves completeness (the q_spatial_join argument).
    * Weighted sums floor-quantize per term; the final ratio is one
    * integer-over-integer divide. Coincident points (d = 0) are
    * excluded by the d > 0 guard, identically on both engines. */
  def qIdwInterp(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GeoOps
    val pts = Tables.events(spark, dir)
      .select(col("event_id"), col("value"),
        ((col("user_id") - 7.5) * 2).as("lat"),
        ((col("value") % 180) - 90.0).as("lon"))
      .withColumn("pcell_lat", floor(col("lat") / 5.0).cast("long"))
      .withColumn("pcell_lon", floor(col("lon") / 5.0).cast("long"))
    val targets = spark.range(0, 100)
      .select((col("id") / 10).cast("int").as("ti"),
        (col("id") % 10).cast("int").as("tj"))
      .withColumn("tlat", col("ti").cast("double") * 5.0 + 2.5)
      .withColumn("tlon", lit(-50.0) + col("tj").cast("double") * 5.0 + 2.5)
      .withColumn("off", explode(expr("sequence(0, 8)")))
      .withColumn("cell_lat",
        floor(col("tlat") / 5.0).cast("long") + (col("off") / 3).cast("long") - 1)
      .withColumn("cell_lon",
        floor(col("tlon") / 5.0).cast("long") + pmod(col("off"), lit(3)).cast("long") - 1)
    targets.join(pts,
        col("cell_lat") === col("pcell_lat") && col("cell_lon") === col("pcell_lon"))
      .withColumn("d", GeoOps.equirectKm(col("tlat"), col("tlon"),
        col("lat"), col("lon"), cosRef))
      .filter(col("d") > 0.0 && col("d") <= 300.0)
      .withColumn("w", lit(1.0) / (col("d") * col("d")))
      .groupBy(col("ti"), col("tj"))
      .agg(count(lit(1)).as("n_pts"),
        sum(floor(col("w") * col("value") * lit(1e6)).cast("long")).as("wvq"),
        sum(floor(col("w") * lit(1e9)).cast("long")).as("wq"))
      .filter(col("wq") > 0L)
      .withColumn("idw_value",
        col("wvq").cast("double") * lit(1000.0) / col("wq").cast("double"))
      .select("ti", "tj", "n_pts", "idw_value")
  }

  val qIdwInterpSql: String = {
    val dxf = (GeoOps2KmPerDegLat * cosRef).toString + "e0"
    val klat = GeoOps2KmPerDegLat.toString + "e0"
    s"""WITH pts AS (
       |  SELECT event_id, value, (user_id - 7.5) * 2 AS lat,
       |    (value % 180) - 90.0 AS lon
       |  FROM events),
       |targets AS (
       |  SELECT CAST(i // 10 AS INT) AS ti, CAST(i % 10 AS INT) AS tj,
       |    CAST(i // 10 AS DOUBLE) * 5.0 + 2.5 AS tlat,
       |    -50.0 + CAST(i % 10 AS DOUBLE) * 5.0 + 2.5 AS tlon
       |  FROM (SELECT unnest(range(100)) AS i)),
       |pairs AS (
       |  SELECT t.ti, t.tj, p.value,
       |    sqrt(((p.lat - t.tlat) * $klat) * ((p.lat - t.tlat) * $klat)
       |       + ((p.lon - t.tlon) * $dxf) * ((p.lon - t.tlon) * $dxf)) AS d
       |  FROM targets t JOIN pts p
       |    ON abs(p.lat - t.tlat) <= 10.0 AND abs(p.lon - t.tlon) <= 10.0),
       |w AS (
       |  SELECT ti, tj, value, 1.0 / (d * d) AS w
       |  FROM pairs WHERE d > 0.0 AND d <= 300.0)
       |SELECT ti, tj, COUNT(*) AS n_pts,
       |  CAST(SUM(CAST(FLOOR(w * value * 1e6) AS BIGINT)) AS DOUBLE) * 1000.0
       |    / CAST(SUM(CAST(FLOOR(w * 1e9) AS BIGINT)) AS DOUBLE) AS idw_value
       |FROM w GROUP BY ti, tj
       |HAVING SUM(CAST(FLOOR(w * 1e9) AS BIGINT)) > 0""".stripMargin
  }

  /** General CRS reprojection, oracle-graded — the reference's
    * `.resample("bilinear").reproject(crs='EPSG:4326', scale=10)`
    * (crop_mapping_processing_data_collection_monthly.py:334-337):
    * the events grid plays a source raster georeferenced in EPSG:4326
    * at 1/128° (x=user_id columns, y=day rows); the target is a
    * 36×60 local-meters window at 500 m scale whose CRS→CRS mapping
    * is the equirectangular closed form (1° lon = 97405 m at the
    * window's latitude, 1° lat = 110540 m — integer constants so
    * every coordinate rounds identically on both engines). The whole
    * pipeline — target grid, CRS math, fractional source pixels,
    * 4-corner bilinear weights, edge gate — runs through
    * [[graft.operators.Reproject.reprojectBilinear]]; the oracle
    * re-derives it from the same closed form. The omerc
    * forward/inverse pair the reference anchors chips with is graded
    * separately (OmercSpec ±1 m vs pyproj). */
  def qReproject(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val srcCrs = Reproject.GridCrs(-17.0, 15.0, 0.0078125, 0.0078125)
    val dstCrs = Reproject.GridCrs(0.0, 0.0, 500.0, 500.0)
    Reproject.reprojectBilinear(src, 36, 60, dstCrs, srcCrs,
      mapX = (mx, _) => lit(-17.0) + mx / lit(97405.0),
      mapY = (_, my) => lit(15.0) + my / lit(110540.0))
  }

  val qReprojectSql: String =
    """WITH src AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |targets AS (
      |  SELECT tx, ty,
      |    ((-17.0 + (tx * 500.0 + 0.0) / 97405.0) - (-17.0)) / 0.0078125 AS u,
      |    -((15.0 + (0.0 - ty * 500.0) / 110540.0) - 15.0) / 0.0078125 AS w
      |  FROM (SELECT unnest(range(36)) AS tx), (SELECT unnest(range(60)) AS ty)),
      |t2 AS (
      |  SELECT tx, ty, u, w,
      |    CAST(FLOOR(u) AS BIGINT) AS x0, CAST(FLOOR(w) AS BIGINT) AS y0,
      |    u - CAST(FLOOR(u) AS BIGINT) AS fx, w - CAST(FLOOR(w) AS BIGINT) AS fy
      |  FROM targets),
      |corners AS (
      |  SELECT tx, ty, fx, fy,
      |    x0 + (i % 2) AS x, y0 + (i // 2) AS y, i % 2 AS dx, i // 2 AS dy,
      |    (CASE WHEN i % 2 = 1 THEN fx ELSE 1.0e0 - fx END)
      |      * (CASE WHEN i // 2 = 1 THEN fy ELSE 1.0e0 - fy END) AS wt
      |  FROM t2, (SELECT unnest(range(4)) AS i)),
      |agg AS (
      |  SELECT tx, ty,
      |    MAX(CASE WHEN dx = 0 AND dy = 0 THEN wt * v END) AS c00,
      |    MAX(CASE WHEN dx = 1 AND dy = 0 THEN wt * v END) AS c10,
      |    MAX(CASE WHEN dx = 0 AND dy = 1 THEN wt * v END) AS c01,
      |    MAX(CASE WHEN dx = 1 AND dy = 1 THEN wt * v END) AS c11,
      |    COUNT(*) AS found
      |  FROM corners c JOIN src s ON c.x = s.x AND c.y = s.y
      |  GROUP BY 1, 2)
      |SELECT tx, ty, c00 + c10 + c01 + c11 AS resampled
      |FROM agg WHERE found = 4""".stripMargin

  /** UTM→EPSG:4326 reprojection, oracle-graded — the reference's REAL
    * projected CRS pair: its Senegal rasters live in UTM zone 28N and
    * `Transformer.from_crs(...)` / `.reproject(crs='EPSG:4326',
    * scale=10)` (presto_modeling.py:86-91; monthly.py:334-337) move
    * between them. The events grid plays a 500 m UTM-28N source
    * raster; the target is a 36×60 geographic window at 1/512° whose
    * CRS→CRS mapping is the full transverse-Mercator forward series
    * ([[graft.functions.Tmerc]]) — polynomial sin/cos over pure IEEE
    * arithmetic, the IDENTICAL staged SQL running through Spark
    * `expr()` here and verbatim CTEs in the oracle, so every E/N
    * (and therefore every bilinear weight) is bit-exact cross-engine.
    * TmercSpec independently pins the series (Simpson meridian arc,
    * k0 scale, roundtrip). Same distributed shape as [[qReproject]]:
    * codegen'd target projection, one equi-join gather, found=4 edge
    * gate. */
  def qReprojectUtm(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Tmerc
    val src = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val srcCrs = Reproject.GridCrs(390000.0, 1700000.0, 500.0, 500.0)
    val dstCrs = Reproject.GridCrs(-16.02, 15.365, 0.001953125, 0.001953125)
    var targets = spark.range(0, 36L).toDF("tx")
      .crossJoin(spark.range(0, 60L).toDF("ty"))
      .withColumn("lon", dstCrs.toModelX(col("tx")))
      .withColumn("lat", dstCrs.toModelY(col("ty")))
    for (stage <- Tmerc.pipeline(Tmerc.centralMeridian(28)); (nm, ex) <- stage)
      targets = targets.withColumn(nm, expr(ex))
    Reproject.bilinearGather(src, targets
      .withColumn("u", srcCrs.toPixelX(col("utm_e")))
      .withColumn("w", srcCrs.toPixelY(col("utm_n")))
      .select("tx", "ty", "u", "w"))
  }

  val qReprojectUtmSql: String = {
    val inner =
      """SELECT tx, ty,
        |    (tx * 0.001953125 + (-1.602e1)) AS lon,
        |    (1.5365e1 - ty * 0.001953125) AS lat
        |  FROM (SELECT unnest(range(36)) AS tx), (SELECT unnest(range(60)) AS ty)""".stripMargin
    val projected = graft.functions.Tmerc.pipelineSql(
      inner, graft.functions.Tmerc.centralMeridian(28))
    s"""WITH src AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |targets AS (
      |  SELECT tx, ty,
      |    ((utm_e - 390000.0) / 500.0) AS u,
      |    (-((utm_n - 1700000.0) / 500.0)) AS w
      |  FROM $projected),
      |t2 AS (
      |  SELECT tx, ty, u, w,
      |    CAST(FLOOR(u) AS BIGINT) AS x0, CAST(FLOOR(w) AS BIGINT) AS y0,
      |    u - CAST(FLOOR(u) AS BIGINT) AS fx, w - CAST(FLOOR(w) AS BIGINT) AS fy
      |  FROM targets),
      |corners AS (
      |  SELECT tx, ty, fx, fy,
      |    x0 + (i % 2) AS x, y0 + (i // 2) AS y, i % 2 AS dx, i // 2 AS dy,
      |    (CASE WHEN i % 2 = 1 THEN fx ELSE 1.0e0 - fx END)
      |      * (CASE WHEN i // 2 = 1 THEN fy ELSE 1.0e0 - fy END) AS wt
      |  FROM t2, (SELECT unnest(range(4)) AS i)),
      |agg AS (
      |  SELECT tx, ty,
      |    MAX(CASE WHEN dx = 0 AND dy = 0 THEN wt * v END) AS c00,
      |    MAX(CASE WHEN dx = 1 AND dy = 0 THEN wt * v END) AS c10,
      |    MAX(CASE WHEN dx = 0 AND dy = 1 THEN wt * v END) AS c01,
      |    MAX(CASE WHEN dx = 1 AND dy = 1 THEN wt * v END) AS c11,
      |    COUNT(*) AS found
      |  FROM corners c JOIN src s ON c.x = s.x AND c.y = s.y
      |  GROUP BY 1, 2)
      |SELECT tx, ty, c00 + c10 + c01 + c11 AS resampled
      |FROM agg WHERE found = 4""".stripMargin
  }

  /** The OTHER direction — EPSG:4326 → UTM target grid, the
    * reference's chip-extraction move (metric windows cut from
    * geographic rasters, presto_modeling.py:86-91): a 36×60 window of
    * 500 m UTM-28N pixels gathers from the 1/128° geographic events
    * grid through the transverse-Mercator INVERSE series
    * ([[graft.functions.Tmerc.inversePipeline]] — footpoint-latitude
    * expansion over the same pinned polynomial sin/cos, identical
    * staged SQL on both engines). With [[qReprojectUtm]] this closes
    * the CRS pair in both directions. */
  def qReprojectToUtm(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Tmerc
    val src = Tables.events(spark, dir)
      .groupBy(col("user_id").as("x"), dayofmonth(col("ts")).as("y"))
      .agg(min(col("value")).as("v"))
    val srcCrs = Reproject.GridCrs(-17.0, 15.0, 0.0078125, 0.0078125)
    val dstCrs = Reproject.GridCrs(288000.0, 1652000.0, 500.0, 500.0)
    var targets = spark.range(0, 36L).toDF("tx")
      .crossJoin(spark.range(0, 60L).toDF("ty"))
      .withColumn("utm_e", dstCrs.toModelX(col("tx")))
      .withColumn("utm_n", dstCrs.toModelY(col("ty")))
    for (stage <- Tmerc.inversePipeline(Tmerc.centralMeridian(28)); (nm, ex) <- stage)
      targets = targets.withColumn(nm, expr(ex))
    Reproject.bilinearGather(src, targets
      .withColumn("u", srcCrs.toPixelX(col("lon")))
      .withColumn("w", srcCrs.toPixelY(col("lat")))
      .select("tx", "ty", "u", "w"))
  }

  val qReprojectToUtmSql: String = {
    val inner =
      """SELECT tx, ty,
        |    (tx * 500.0 + 288000.0) AS utm_e,
        |    (1652000.0 - ty * 500.0) AS utm_n
        |  FROM (SELECT unnest(range(36)) AS tx), (SELECT unnest(range(60)) AS ty)""".stripMargin
    val projected = graft.functions.Tmerc.inversePipelineSql(
      inner, graft.functions.Tmerc.centralMeridian(28))
    s"""WITH src AS (
      |  SELECT user_id AS x, day(ts) AS y, MIN(value) AS v
      |  FROM events GROUP BY 1, 2),
      |targets AS (
      |  SELECT tx, ty,
      |    ((lon - (-17.0)) / 0.0078125) AS u,
      |    (-((lat - 15.0) / 0.0078125)) AS w
      |  FROM $projected),
      |t2 AS (
      |  SELECT tx, ty, u, w,
      |    CAST(FLOOR(u) AS BIGINT) AS x0, CAST(FLOOR(w) AS BIGINT) AS y0,
      |    u - CAST(FLOOR(u) AS BIGINT) AS fx, w - CAST(FLOOR(w) AS BIGINT) AS fy
      |  FROM targets),
      |corners AS (
      |  SELECT tx, ty, fx, fy,
      |    x0 + (i % 2) AS x, y0 + (i // 2) AS y, i % 2 AS dx, i // 2 AS dy,
      |    (CASE WHEN i % 2 = 1 THEN fx ELSE 1.0e0 - fx END)
      |      * (CASE WHEN i // 2 = 1 THEN fy ELSE 1.0e0 - fy END) AS wt
      |  FROM t2, (SELECT unnest(range(4)) AS i)),
      |agg AS (
      |  SELECT tx, ty,
      |    MAX(CASE WHEN dx = 0 AND dy = 0 THEN wt * v END) AS c00,
      |    MAX(CASE WHEN dx = 1 AND dy = 0 THEN wt * v END) AS c10,
      |    MAX(CASE WHEN dx = 0 AND dy = 1 THEN wt * v END) AS c01,
      |    MAX(CASE WHEN dx = 1 AND dy = 1 THEN wt * v END) AS c11,
      |    COUNT(*) AS found
      |  FROM corners c JOIN src s ON c.x = s.x AND c.y = s.y
      |  GROUP BY 1, 2)
      |SELECT tx, ty, c00 + c10 + c01 + c11 AS resampled
      |FROM agg WHERE found = 4""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_reproject" -> (qReproject _),
    "q_reproject_utm" -> (qReprojectUtm _),
    "q_reproject_to_utm" -> (qReprojectToUtm _),
    "q_idw_interp" -> (qIdwInterp _),
    "q_focal_min" -> (qFocalMin _),
    "q_spatial_join" -> (qSpatialJoin _),
    "q_geo_cells" -> (qGeoCells _),
    "q_bilinear_resample" -> (qBilinearResample _),
    "q_terrain_gradient" -> (qTerrainGradient _),
    "q_terrain" -> (qTerrain _),
  )

  val oracle: Map[String, String] = Map(
    "q_reproject" -> qReprojectSql,
    "q_reproject_utm" -> qReprojectUtmSql,
    "q_reproject_to_utm" -> qReprojectToUtmSql,
    "q_idw_interp" -> qIdwInterpSql,
    "q_focal_min" -> qFocalMinSql,
    "q_spatial_join" -> qSpatialJoinSql,
    "q_geo_cells" -> qGeoCellsSql,
    "q_bilinear_resample" -> qBilinearResampleSql,
    "q_terrain_gradient" -> qTerrainGradientSql,
    "q_terrain" -> qTerrainSql,
  )
}
