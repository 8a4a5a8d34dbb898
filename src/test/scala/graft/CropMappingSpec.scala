package graft

import org.apache.spark.sql.functions._
import graft.pipelines.CropMapping
import graft.sources.ObservationsGen

/** Golden-value test for the flagship pipeline: every assertion is
  * hand-computable from ObservationsGen's closed-form fixture. */
class CropMappingSpec extends SparkSpec {

  private lazy val out = CropMapping.build(
    ObservationsGen.observations(spark), ObservationsGen.labels(spark)).cache()

  test("one output row per cell with a full 12-step series") {
    assert(out.count() == ObservationsGen.Cells)
    val sizes = out.select(size(col("series")).as("s")).distinct().collect()
    assert(sizes.map(_.getInt(0)).toSeq == Seq(12))
  }

  test("QA masking drops the cloudy image so medians are base+5") {
    // cell 5 (x=1,y=1), month m: S2 images carry {base, base+10, base-10},
    // img 2 (base-10) is cloud-flagged → median of survivors = base+5
    val row = out.filter(col("cell_x") === 1 && col("cell_y") === 1).collect()(0)
    val series = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("series")
    val cell = 5
    for (m0 <- 0 until 12) {
      val base = cell * 10 + m0
      val st = series(m0)
      assert(st.getAs[Double]("b4") == base + 5.0 + 100.0, s"month $m0 b4")
      assert(st.getAs[Double]("b8") == base + 5.0 + 200.0)
      // S1 has no QA: median of {v, v+10, v-10} = v
      assert(st.getAs[Double]("vv") == base - 15.0)
      val b4 = base + 105.0; val b8 = base + 205.0
      assert(st.getAs[Double]("ndvi") == (b8 - b4) / (b8 + b4))
    }
  }

  test("as-of join picks the day-12 DW image nearest the month midpoint") {
    val row = out.filter(col("cell_x") === 2 && col("cell_y") === 0).collect()(0)
    val series = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("series")
    val cell = 2
    for (m0 <- 0 until 12)
      assert(series(m0).getAs[Int]("dw") == (cell + m0) % 9, s"month $m0")
  }

  test("label rasterization burns polygon classes; DW overlay fills elsewhere") {
    val labels = out.select(col("cell_x"), col("cell_y"), col("label"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    // class 3 rectangle covers cell_x in [0,1]
    for (x <- 0 to 1; y <- 0 to 3) assert(labels((x, y)) == 3, s"($x,$y)")
    // class 5 rectangle covers (3, 2..3)
    for (y <- 2 to 3) assert(labels((3, y)) == 5)
    // unlabeled cells get the month-1 DW class where it isn't 4
    for (x <- 2 to 2; y <- 0 to 3) {
      val cell = y * 4 + x
      val dw1 = (cell + 0) % 9
      val expected = if (dw1 != 4) dw1 else 0
      assert(labels((x, y)) == expected, s"($x,$y) dw1=$dw1")
    }
  }

  test("static SRTM joins once per cell") {
    val e = out.filter(col("cell_x") === 3 && col("cell_y") === 3)
      .select("elevation").collect()(0).getDouble(0)
    assert(e == 15 * 25.0 + 40.0)
  }

  test("geo label points rasterize through omerc chips and label every covered cell") {
    val geoLabels = CropMapping.labelChips(ObservationsGen.labelPoints(spark),
      ObservationsGen.AoiLon, ObservationsGen.AoiLat, cellSizeM = 640.0)
    val r = geoLabels.collect()
    assert(r.length == 1)
    // centroid at (+1300, +1300) m, chip corners at 20..2580 m -> cells 0..4
    assert(r(0).getInt(1) == 0 && r(0).getInt(2) == 4 &&
      r(0).getInt(3) == 0 && r(0).getInt(4) == 4, r(0).toString)
    val outGeo = CropMapping.build(ObservationsGen.observations(spark), geoLabels)
    assert(outGeo.count() == 16)
    assert(outGeo.filter(col("label") === 3).count() == 16,
      "the 2560 m chip covers the whole 4x4 grid, so every cell takes its class")
  }
}
