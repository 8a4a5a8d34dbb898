package graft

import graft.functions.Omerc
import graft.pipelines.CropMapping

/** The omerc port vs independent ellipsoidal expectations. The spec
  * anchors at the reference's Senegal AOI latitudes; corner positions
  * of the 2560 m chip square are compared against first-order
  * ellipsoidal-arc offsets (meridian radius M, parallel radius
  * ν·cosφ — independent textbook formulas, exact to centimeters at
  * this scale), so agreement within ±1 m is a non-circular check of
  * the Snyder HOM math. */
class OmercSpec extends SparkSpec {

  import math._

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2.0 - f)

  private val senLon = -16.45
  private val senLat = 14.72

  private def meridianRadius(latDeg: Double): Double = {
    val s = sin(toRadians(latDeg))
    a * (1.0 - e2) / pow(1.0 - e2 * s * s, 1.5)
  }

  private def parallelRadius(latDeg: Double): Double = {
    val phi = toRadians(latDeg)
    val s = sin(phi)
    a / sqrt(1.0 - e2 * s * s) * cos(phi)
  }

  test("anchor projects to the origin") {
    val p = Omerc(senLon, senLat)
    val (x, y) = p.forward(senLon, senLat)
    assert(abs(x) < 1e-6 && abs(y) < 1e-6, s"anchor -> ($x, $y)")
  }

  test("axes are east/north positive and meter-scaled (k=1)") {
    val p = Omerc(senLon, senLat)
    val (xe, ye) = p.forward(senLon + 0.01, senLat)
    val (xn, yn) = p.forward(senLon, senLat + 0.01)
    assert(xe > 0 && abs(ye) < 1.0)
    assert(yn > 0 && abs(xn) < 1.0)
    // 0.01 deg of longitude at this latitude is ~0.01*pi/180*parallelRadius
    assert(abs(xe - toRadians(0.01) * parallelRadius(senLat)) < 0.01, s"xe=$xe")
    assert(abs(yn - toRadians(0.01) * meridianRadius(senLat)) < 0.01, s"yn=$yn")
  }

  test("roundtrip inverse(forward) is exact to 1e-10 degrees across the AOI") {
    val p = Omerc(senLon, senLat)
    for (dLon <- Seq(-0.5, -0.1, 0.0, 0.1, 0.5); dLat <- Seq(-0.5, -0.1, 0.0, 0.1, 0.5)) {
      val (lon, lat) = (senLon + dLon, senLat + dLat)
      val (x, y) = p.forward(lon, lat)
      val (lon2, lat2) = p.inverse(x, y)
      assert(abs(lon2 - lon) < 1e-10 && abs(lat2 - lat) < 1e-10,
        s"roundtrip ($lon,$lat) -> ($x,$y) -> ($lon2,$lat2)")
    }
  }

  test("2560 m chip corners sit within 1 m of ellipsoidal-arc expectations (Senegal)") {
    for ((lon, lat) <- Seq((senLon, senLat), (-14.2, 13.1), (-12.9, 16.4))) {
      val h = 1280.0
      val dLon = toDegrees(h / parallelRadius(lat))
      val dLat = toDegrees(h / meridianRadius(lat))
      val expected = Seq(
        (lon - dLon, lat - dLat), (lon + dLon, lat - dLat),
        (lon + dLon, lat + dLat), (lon - dLon, lat + dLat))
      val actual = Omerc.centroidSquare(lon, lat, 2560.0)
      assert(actual.length == 5 && actual.head == actual.last, "square must be closed")
      for (((elon, elat), (alon, alat)) <- expected.zip(actual.dropRight(1))) {
        val dxM = toRadians(abs(alon - elon)) * parallelRadius(lat)
        val dyM = toRadians(abs(alat - elat)) * meridianRadius(lat)
        assert(dxM < 1.0 && dyM < 1.0,
          s"corner at ($lon,$lat): expected ($elon,$elat) got ($alon,$alat), off ($dxM m, $dyM m)")
      }
    }
  }

  test("labelChips rasterizes a centroid chip onto the expected cell range") {
    import spark.implicits._
    val pts = Seq((1L, senLon, senLat, 3), (2L, senLon + 0.05, senLat + 0.05, 5))
      .toDF("poly_id", "lon", "lat", "cls")
    val chips = CropMapping.labelChips(pts, senLon, senLat, cellSizeM = 10.0)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    // chip 1 is centered on the AOI anchor: corners at +-1280 m ->
    // exactly 256 ten-meter cells, -128..127
    val (x0, x1, y0, y1, c1) = chips(1L)
    assert(c1 == 3)
    assert(x0 == -128 && x1 == 127 && y0 == -128 && y1 == 127, chips(1L).toString)
    // chip 2 is ~5.4 km NE: not cell-aligned, so the 2560 m square
    // covers 256 or 257 cells depending on phase; strictly positive
    val (u0, u1, v0, v1, c2) = chips(2L)
    assert(c2 == 5)
    assert(Set(255, 256)(u1 - u0) && Set(255, 256)(v1 - v0), chips(2L).toString)
    assert(u0 > 127 && v0 > 127, chips(2L).toString)
  }
}
