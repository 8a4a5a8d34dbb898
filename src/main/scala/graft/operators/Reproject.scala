package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General raster reprojection as a generated bilinear weight table —
  * the Spark-first form of the reference's
  * `.resample("bilinear").reproject(crs='EPSG:4326', scale=10)`
  * (crop_mapping_processing_data_collection_monthly.py:334-337) and
  * its rasterio `Resampling.bilinear` to a new H×W
  * (src/test.py:11-47).
  *
  * The design splits reprojection into (a) CRS math — a per-target
  * closed-form mapping from target pixel indices to FRACTIONAL source
  * pixel coordinates, expressed as Catalyst `Column`s so it stays
  * inside whole-stage codegen — and (b) the gather — each target
  * pixel reads its 4 surrounding source pixels with bilinear weights.
  * (a) is embarrassingly parallel; (b) is ONE equi-join on the source
  * pixel key followed by a 4-row-group aggregation. Nothing is
  * all-pairs and nothing collects: at 100 TB the join shuffles
  * target-corner rows (4 per target pixel) against the source grid on
  * (x, y) — broadcastable when the target window is small, plain
  * shuffle-hash otherwise, and AQE picks per stats.
  *
  * Weight-table semantics (matches rasterio/EE bilinear): a target
  * cell whose 4 corners are not ALL present in the source is dropped
  * (the `found = 4` gate) — the edge-handling rasterio calls nodata.
  * The corner sum is accumulated in the fixed order
  * c00 + c10 + c01 + c11 so results are bit-reproducible across
  * partitionings and engines.
  */
object Reproject {

  /** A north-up affine grid georeference: pixel (px, py) centers at
    * `modelX = originX + px * stepX`, `modelY = originY - py * stepY`
    * — the ModelPixelScale/ModelTiepoint affine with rows growing
    * southward ([[MultimodalOps.TiffGeoref]] without the CRS code). */
  case class GridCrs(originX: Double, originY: Double,
                     stepX: Double, stepY: Double) {
    /** Fractional source-pixel coords of a model point (Column form). */
    def toPixelX(modelX: Column): Column = (modelX - originX) / stepX
    def toPixelY(modelY: Column): Column = -(modelY - originY) / stepY
    def toModelX(px: Column): Column = px * stepX + originX
    def toModelY(py: Column): Column = lit(originY) - py * stepY
  }

  /** Bilinear gather: `targets` must carry (tx, ty, u, w) where
    * (u, w) are fractional SOURCE pixel coordinates; `src` is the
    * source grid (x, y, v). Returns (tx, ty, resampled) for every
    * target whose 4 corners exist in `src`. */
  def bilinearGather(src: DataFrame, targets: DataFrame): DataFrame = {
    val corners = targets
      .withColumn("x0", floor(col("u")).cast("long"))
      .withColumn("y0", floor(col("w")).cast("long"))
      .withColumn("fx", col("u") - col("x0"))
      .withColumn("fy", col("w") - col("y0"))
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

  /** Full reproject: source grid (x, y, v) georeferenced by `srcCrs`
    * in CRS-A model units; a target window of `nTx` × `nTy` pixels
    * georeferenced by `dstCrs` in CRS-B units; `mapX`/`mapY` convert
    * a CRS-B model point to CRS-A model coordinates (the
    * `Transformer.from_proj` analog, expressed as Column math so the
    * whole mapping codegens). Output: (tx, ty, resampled) — the
    * reprojected raster at the target scale. */
  def reprojectBilinear(src: DataFrame, nTx: Int, nTy: Int,
      dstCrs: GridCrs, srcCrs: GridCrs,
      mapX: (Column, Column) => Column,
      mapY: (Column, Column) => Column): DataFrame = {
    val spark = src.sparkSession
    val targets = spark.range(0, nTx.toLong).toDF("tx")
      .crossJoin(spark.range(0, nTy.toLong).toDF("ty"))
      .withColumn("mx", dstCrs.toModelX(col("tx")))
      .withColumn("my", dstCrs.toModelY(col("ty")))
      .withColumn("u", srcCrs.toPixelX(mapX(col("mx"), col("my"))))
      .withColumn("w", srcCrs.toPixelY(mapY(col("mx"), col("my"))))
      .select("tx", "ty", "u", "w")
    bilinearGather(src, targets)
  }
}
