package graft

import org.apache.spark.sql.functions._

/** Runs the flagship crop-mapping pipeline (pipelines.CropMapping) on
  * the canonical observations fixture end-to-end and prints the
  * output shape + one labeled cell. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val out = pipelines.CropMapping.build(
      sources.ObservationsGen.observations(spark),
      sources.ObservationsGen.labels(spark))
    val n = out.count()
    val full = out.filter(size(col("series")) === 12).count()
    println(s"pipeline cells=$n full_series=$full")
    out.orderBy("cell_y", "cell_x")
      .select("cell_x", "cell_y", "label", "elevation")
      .show(4, truncate = false)
    assert(n > 0 && full == n)
    // the reference-faithful geo-label path: centroid → omerc 2560 m
    // chip → rasterized rectangles → the same build
    val geoLabels = pipelines.CropMapping.labelChips(
      sources.ObservationsGen.labelPoints(spark),
      sources.ObservationsGen.AoiLon, sources.ObservationsGen.AoiLat,
      cellSizeM = 640.0)
    val outGeo = pipelines.CropMapping.build(
      sources.ObservationsGen.observations(spark), geoLabels)
    val labeled = outGeo.filter(col("label") === 3).count()
    println(s"geo-label pipeline cells=${outGeo.count()} labeled_cls3=$labeled")
    assert(labeled == outGeo.count(), "omerc chip should cover the whole fixture grid")
    val pre = pipelines.PretrainingTable.build(
      sources.ObservationsGen.observations(spark))
    val masked = pre.select(explode(col("mask")).as("m")).filter(col("m")).count()
    println(s"pretraining examples=${pre.count()} masked_slots=$masked")
    spark.stop()
  }
}
