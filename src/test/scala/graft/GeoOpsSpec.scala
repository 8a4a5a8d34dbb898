package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoOps

class GeoOpsSpec extends SparkSpec {

  test("haversine matches known distances and is symmetric") {
    import spark.implicits._
    val df = Seq(
      (0.0, 0.0, 0.0, 1.0),    // 1° lon at equator ≈ 111.19 km
      (14.7, -17.4, 14.7, -17.4), // same point → 0
      (48.85, 2.35, 40.71, -74.0), // Paris → NYC ≈ 5837 km
    ).toDF("lat1", "lon1", "lat2", "lon2")
    val d = df.select(
      GeoOps.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d"),
      GeoOps.haversineKm(col("lat2"), col("lon2"), col("lat1"), col("lon1")).as("rev"))
      .collect()
    assert(math.abs(d(0).getDouble(0) - 111.19) < 0.1)
    assert(d(1).getDouble(0) == 0.0)
    assert(math.abs(d(2).getDouble(0) - 5837.0) < 10.0)
    d.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("equirect approximates haversine regionally and grid cells partition space") {
    import spark.implicits._
    val cosRef = math.cos(14.7 * math.Pi / 180.0)
    val df = Seq((14.7, -14.5, 15.2, -15.0)).toDF("lat1", "lon1", "lat2", "lon2")
    val r = df.select(
      GeoOps.equirectKm(col("lat1"), col("lon1"), col("lat2"), col("lon2"), cosRef).as("e"),
      GeoOps.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("h"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1) < 0.01)
    // neighboring cells differ, same-cell points agree
    val cells = Seq((14.7, -14.5), (14.8, -14.4), (22.0, -14.5))
      .toDF("lat", "lon")
      .select(GeoOps.gridCellId(col("lat"), col("lon"), 5.0).as("c"))
      .as[Long].collect()
    assert(cells(0) == cells(1) && cells(0) != cells(2))
  }

  test("toCartesian lands on the unit sphere") {
    import spark.implicits._
    val df = Seq((14.7, -14.5), (-33.9, 151.2), (90.0, 0.0)).toDF("lat", "lon")
    val norms = df.select(GeoOps.toCartesian(col("lat"), col("lon")): _*)
      .select((col("cart_x") * col("cart_x") + col("cart_y") * col("cart_y") +
        col("cart_z") * col("cart_z")).as("n2"))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }
}
