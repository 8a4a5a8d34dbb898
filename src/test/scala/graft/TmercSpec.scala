package graft

import graft.functions.Tmerc

/** Transverse Mercator: the scalar series vs INDEPENDENT expectations
  * (Simpson-integrated meridian arc, closed-form anchors, roundtrip),
  * and the shared-SQL polynomial face vs the scalar libm face — the
  * cross-engine bit-exactness of q_reproject_utm rides on the SQL
  * pipeline computing the same values on Spark and DuckDB, and its
  * CORRECTNESS rides on these independence checks. */
class TmercSpec extends SparkSpec {

  private val Lon0 = Tmerc.centralMeridian(28) // Senegal: UTM zone 28N

  test("central meridian maps to easting 500000 exactly, any latitude") {
    for (lat <- Seq(0.0, 14.7, 15.365, 45.0, 83.0)) {
      val (e, _) = Tmerc.forward(Lon0, lat, Lon0)
      assert(e == 500000.0, s"lat=$lat easting=$e")
    }
  }

  test("northing on the central meridian equals k0 x Simpson-integrated meridian arc < 1 m") {
    // independent of the Snyder series: numerically integrate
    // a(1-e2)/(1-e2 sin^2 phi)^1.5 dphi (the meridian radius of
    // curvature) with Simpson's rule at 1e-4 rad steps
    def integrand(phi: Double): Double = {
      val s = math.sin(phi)
      Tmerc.A * (1.0 - Tmerc.E2) / math.pow(1.0 - Tmerc.E2 * s * s, 1.5)
    }
    for (latDeg <- Seq(15.0, 15.365, 45.0, 70.0)) {
      val phi = math.toRadians(latDeg)
      val n = 20000
      val h = phi / n
      var acc = integrand(0) + integrand(phi)
      for (i <- 1 until n)
        acc += (if (i % 2 == 1) 4.0 else 2.0) * integrand(i * h)
      val arc = acc * h / 3.0
      val (_, northing) = Tmerc.forward(Lon0, latDeg, Lon0)
      assert(math.abs(northing - Tmerc.K0 * arc) < 1.0,
        s"lat=$latDeg series=${northing} simpson=${Tmerc.K0 * arc}")
    }
  }

  test("point scale at the central meridian is k0 = 0.9996 (numeric derivative)") {
    val lat = 15.3
    val dLon = 1e-6
    val (e1, _) = Tmerc.forward(Lon0 - dLon / 2, lat, Lon0)
    val (e2, _) = Tmerc.forward(Lon0 + dLon / 2, lat, Lon0)
    val groundDist = // geodesic parallel arc for dLon at this latitude
      math.toRadians(dLon) * math.cos(math.toRadians(lat)) *
        (Tmerc.A / math.sqrt(1.0 - Tmerc.E2 * math.pow(math.sin(math.toRadians(lat)), 2)))
    val scale = (e2 - e1) / groundDist
    assert(math.abs(scale - 0.9996) < 1e-7, s"scale=$scale")
  }

  test("forward->inverse roundtrip < 1e-9 degrees across the zone") {
    for (lon <- Seq(-17.9, -16.02, -15.0, -12.1); lat <- Seq(12.1, 14.7, 15.365, 16.9)) {
      val (e, n) = Tmerc.forward(lon, lat, Lon0)
      val (lon2, lat2) = Tmerc.inverse(e, n, Lon0)
      assert(math.abs(lon2 - lon) < 1e-9, s"($lon,$lat) lon back $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"($lon,$lat) lat back $lat2")
    }
  }

  test("shared-SQL polynomial pipeline matches the scalar libm series < 1 mm") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = for (lon <- Seq(-17.5, -16.02, -15.9517, -15.0, -13.2);
                   lat <- Seq(0.5, 12.1, 15.2498, 15.365, 45.0, 70.0))
      yield (lon, lat)
    var df = pts.toDF("lon", "lat")
    for (stage <- Tmerc.pipeline(Lon0); (nm, ex) <- stage)
      df = df.withColumn(nm, expr(ex))
    val got = df.select("lon", "lat", "utm_e", "utm_n").collect()
    got.foreach { r =>
      val (e, n) = Tmerc.forward(r.getDouble(0), r.getDouble(1), Lon0)
      assert(math.abs(r.getDouble(2) - e) < 1e-3,
        s"(${r.getDouble(0)},${r.getDouble(1)}) E poly=${r.getDouble(2)} libm=$e")
      assert(math.abs(r.getDouble(3) - n) < 1e-3,
        s"(${r.getDouble(0)},${r.getDouble(1)}) N poly=${r.getDouble(3)} libm=$n")
    }
  }

  test("shared-SQL inverse pipeline matches the scalar libm inverse < 1e-9 deg") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = for (e <- Seq(288000.0, 338700.0, 500000.0, 611000.0);
                   n <- Seq(1622500.0, 1647930.0, 1700000.0, 4500000.0))
      yield (e, n)
    var df = pts.toDF("utm_e", "utm_n")
    for (stage <- Tmerc.inversePipeline(Lon0); (nm, ex) <- stage)
      df = df.withColumn(nm, expr(ex))
    val got = df.select("utm_e", "utm_n", "lon", "lat").collect()
    got.foreach { r =>
      val (lon, lat) = Tmerc.inverse(r.getDouble(0), r.getDouble(1), Lon0)
      assert(math.abs(r.getDouble(2) - lon) < 1e-9,
        s"(${r.getDouble(0)},${r.getDouble(1)}) lon sql=${r.getDouble(2)} libm=$lon")
      assert(math.abs(r.getDouble(3) - lat) < 1e-9,
        s"(${r.getDouble(0)},${r.getDouble(1)}) lat sql=${r.getDouble(3)} libm=$lat")
    }
    // and the SQL inverse undoes the SQL forward: full roundtrip < 1e-9 deg
    var rt = Seq((-16.97, 14.9), (-16.02, 15.365), (-15.0, 14.0))
      .toDF("lon0c", "lat0c")
      .withColumn("lon", col("lon0c")).withColumn("lat", col("lat0c"))
    for (stage <- Tmerc.pipeline(Lon0); (nm, ex) <- stage)
      rt = rt.withColumn(nm, expr(ex))
    rt = rt.drop("lon", "lat")
    for (stage <- Tmerc.inversePipeline(Lon0); (nm, ex) <- stage)
      rt = rt.withColumn(nm, expr(ex))
    rt.select("lon0c", "lat0c", "lon", "lat").collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-9, r.toString)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-9, r.toString)
    }
  }

  test("polynomial sin/cos track libm to ~1 ulp over the latitude range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val xs = (-147 to 147).map(_ / 100.0)
    val rows = xs.toDF("x")
      .withColumn("ps", expr(Tmerc.sinSql("x")))
      .withColumn("pc", expr(Tmerc.cosSql("x")))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      assert(math.abs(r.getDouble(1) - math.sin(x)) < 1e-15, s"sin($x)")
      assert(math.abs(r.getDouble(2) - math.cos(x)) < 1e-15, s"cos($x)")
    }
  }
}
