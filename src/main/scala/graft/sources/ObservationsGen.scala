package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded generator for the canonical `observations` fixture
  * (FIXTURES.md §1): a compact multi-source long table shaped like
  * the reference's post-ingest collections — S1 (VV/VH), S2 (optical
  * bands + QA60 cloud bits + cloud percentage), DynamicWorld class
  * images, and static SRTM — over a (tile, cell_x, cell_y) grid and
  * 12 monthly windows.
  *
  * Values are closed-form functions of (cell, month, image index), so
  * pipeline outputs are hand-computable: per (cell, month) the three
  * S2/S1 images carry base, base+10, base−10; image 2 is always
  * cloud-flagged (QA60 bit 10) so after QA masking the surviving pair
  * {base, base+10} has median base+5. DW images sit at day 12/19/26
  * with classes (cell+month)%9, (cell+month+1)%9, 8 — day 12 is
  * nearest to the mid-month anchor (day 15). Everything is generated
  * distributed (spark.range), never on the driver.
  */
object ObservationsGen {

  val Cells = 16 // 4×4 grid in one tile
  val Months = 12
  val ImagesPerMonth = 3

  def observations(spark: SparkSession): DataFrame = {
    val n = Cells * Months * ImagesPerMonth
    val base = spark.range(0, n).toDF("i")
      .withColumn("cell", (col("i") % Cells).cast("int"))
      .withColumn("month0", ((col("i") / Cells) % Months).cast("int"))
      .withColumn("img", (col("i") / (Cells * Months)).cast("int"))
      .withColumn("cell_x", col("cell") % 4)
      .withColumn("cell_y", expr("cell div 4").cast("int"))
      .withColumn("tile", lit("T01"))
      .withColumn("ts", expr("make_timestamp(2024, month0 + 1, img * 7 + 3, 10, 0, 0)"))
      .withColumn("bump", when(col("img") === 1, 10.0).when(col("img") === 2, -10.0).otherwise(0.0))
      .withColumn("vbase", (col("cell") * 10 + col("month0")).cast("double"))
    val s2 = base.select(
      lit("S2_HARMONIZED").as("source"), col("tile"), col("cell_x"), col("cell_y"),
      col("ts"), col("month0"),
      (col("vbase") + col("bump") + 100.0).as("B4"),
      (col("vbase") + col("bump") + 200.0).as("B8"),
      (col("vbase") + col("bump") + 50.0).as("B11"),
      when(col("img") === 2, lit(1L << 10)).otherwise(lit(0L)).as("QA60"),
      when(col("img") === 2, 80.0).otherwise(5.0).as("CLOUDY_PIXEL_PERCENTAGE"),
      lit(null).cast("double").as("VV"), lit(null).cast("double").as("VH"),
      lit(null).cast("int").as("dw_label"), lit(null).cast("double").as("elevation"))
    val s1 = base.select(
      lit("S1_GRD").as("source"), col("tile"), col("cell_x"), col("cell_y"),
      col("ts"), col("month0"),
      lit(null).cast("double").as("B4"), lit(null).cast("double").as("B8"),
      lit(null).cast("double").as("B11"),
      lit(null).cast("long").as("QA60"), lit(null).cast("double").as("CLOUDY_PIXEL_PERCENTAGE"),
      (col("vbase") + col("bump") - 15.0).as("VV"),
      (col("vbase") + col("bump") - 20.0).as("VH"),
      lit(null).cast("int").as("dw_label"), lit(null).cast("double").as("elevation"))
    val dw = base.filter(col("img") < 3).select(
      lit("DW").as("source"), col("tile"), col("cell_x"), col("cell_y"),
      expr("make_timestamp(2024, month0 + 1, CASE img WHEN 0 THEN 12 WHEN 1 THEN 19 ELSE 26 END, 0, 0, 0)").as("ts"),
      col("month0"),
      lit(null).cast("double").as("B4"), lit(null).cast("double").as("B8"),
      lit(null).cast("double").as("B11"),
      lit(null).cast("long").as("QA60"), lit(null).cast("double").as("CLOUDY_PIXEL_PERCENTAGE"),
      lit(null).cast("double").as("VV"), lit(null).cast("double").as("VH"),
      when(col("img") === 0, (col("cell") + col("month0")) % 9)
        .when(col("img") === 1, (col("cell") + col("month0") + 1) % 9)
        .otherwise(8).cast("int").as("dw_label"),
      lit(null).cast("double").as("elevation"))
    val srtm = spark.range(0, Cells).toDF("cell").select(
      lit("SRTM").as("source"), lit("T01").as("tile"),
      (col("cell") % 4).cast("int").as("cell_x"), expr("cell div 4").cast("int").as("cell_y"),
      expr("make_timestamp(2024, 1, 1, 0, 0, 0)").as("ts"), lit(0).as("month0"),
      lit(null).cast("double").as("B4"), lit(null).cast("double").as("B8"),
      lit(null).cast("double").as("B11"),
      lit(null).cast("long").as("QA60"), lit(null).cast("double").as("CLOUDY_PIXEL_PERCENTAGE"),
      lit(null).cast("double").as("VV"), lit(null).cast("double").as("VH"),
      lit(null).cast("int").as("dw_label"),
      (col("cell") * 25.0 + 40.0).as("elevation"))
    s2.unionByName(s1).unionByName(dw).unionByName(srtm).drop("month0")
  }

  /** Label polygons as rectangles over the cell grid (the reference's
    * GeoDataFrame after cleaning, monthly.py:664-692): class 3 covers
    * cells with cell_x < 2; class 5 covers cell_x = 3 and cell_y > 1. */
  def labels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 0, 1, 0, 3, 3), // xmin, xmax, ymin, ymax, class
      (2L, 3, 3, 2, 3, 5),
    ).toDF("poly_id", "xmin", "xmax", "ymin", "ymax", "cls")
  }

  /** AOI anchor for the geo-label flow (Senegal, like the reference's
    * Tolbi AOI). */
  val AoiLon = -16.45
  val AoiLat = 14.72

  /** Geo label centroids for the reference-faithful label path:
    * centroid → 2560 m omerc chip → rasterized cells
    * (CropMapping.labelChips). The single centroid sits +1300 m east
    * and north of the AOI anchor, so at 640 m cells its chip covers
    * cell range 0..4 on both axes — a 20 m margin from every cell
    * boundary keeps the rasterization insensitive to the
    * centimeter-level difference between the centroid's own omerc
    * frame and the AOI frame. */
  def labelPoints(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (lon, lat) = graft.functions.Omerc(AoiLon, AoiLat).inverse(1300.0, 1300.0)
    Seq((1L, lon, lat, 3)).toDF("poly_id", "lon", "lat", "cls")
  }
}
