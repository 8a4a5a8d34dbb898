package graft.functions

/** Hotine Oblique Mercator (PROJ `omerc`) anchored at a point — the
  * reference's chip-geometry projection: `get_projections` builds
  * {proj: omerc, lat_0: centroid.y, lonc: centroid.x, alpha: 1e-6,
  * k: 1, gamma: 0, ellps: WGS84} and `centroid_to_square` buffers
  * side/2 meters (square cap) in the projected frame, then
  * inverse-projects the corners
  * (src/crop_mapping_processing_data_collection_monthly.py:147-161,
  * 194-211).
  *
  * This is a pure-math port of Snyder, "Map Projections — A Working
  * Manual" (USGS PP 1395), pp. 66-75, HOM alternate B (center-point
  * form with azimuth alpha), with PROJ's conventions: the u-offset
  * u_c is subtracted so the anchor maps to (0,0), and with gamma = 0
  * the rectified axes are (x = v east-positive, y = u
  * north-positive). libm trig keeps it out of the DuckDB oracle;
  * OmercSpec pins it against independent ellipsoidal-arc expectations
  * at Senegal latitudes (±1 m) and exact roundtrips.
  */
final case class Omerc(anchorLonDeg: Double, anchorLatDeg: Double,
    alphaDeg: Double = 1e-6) {

  import math._

  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2.0 - f)
  private val e = sqrt(e2)

  private val phi0 = toRadians(anchorLatDeg)
  private val lamC = toRadians(anchorLonDeg)
  private val alpha = toRadians(alphaDeg)

  private val cosPhi0 = cos(phi0)
  private val sinPhi0 = sin(phi0)

  private val B = sqrt(1.0 + e2 * pow(cosPhi0, 4) / (1.0 - e2))
  private val A = a * B * sqrt(1.0 - e2) / (1.0 - e2 * sinPhi0 * sinPhi0)
  private def tsfn(phi: Double): Double =
    tan(Pi / 4.0 - phi / 2.0) /
      pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0)
  private val t0 = tsfn(phi0)
  private val D = B * sqrt(1.0 - e2) / (cosPhi0 * sqrt(1.0 - e2 * sinPhi0 * sinPhi0))
  private val D2 = max(D * D, 1.0)
  private val F = D + sqrt(D2 - 1.0) * signum(phi0)
  private val E = F * pow(t0, B)
  private val G = (F - 1.0 / F) / 2.0
  private val gamma0 = asin(sin(alpha) / D)
  private val lam0 = lamC - asin(G * tan(gamma0)) / B
  private val uc = (A / B) * atan2(sqrt(D2 - 1.0), cos(alpha)) * signum(phi0)

  /** (lonDeg, latDeg) → projected (x east, y north) in meters. */
  def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = toRadians(latDeg)
    // wrap λ−λ0 to (−π, π] so anchors near the antimeridian (or points
    // >180° of longitude away) project on the correct branch of sin/cos(B·λd)
    val lamDRaw = toRadians(lonDeg) - lam0
    val lamD = atan2(sin(lamDRaw), cos(lamDRaw))
    val t = tsfn(phi)
    val q = E / pow(t, B)
    val s = (q - 1.0 / q) / 2.0
    val tt = (q + 1.0 / q) / 2.0
    val vv = sin(B * lamD)
    val u0 = (-vv * cos(gamma0) + s * sin(gamma0)) / tt
    val v = A * log((1.0 - u0) / (1.0 + u0)) / (2.0 * B)
    val u = A * atan2(s * cos(gamma0) + vv * sin(gamma0), cos(B * lamD)) / B - uc
    (v, u) // gamma = 0: x = v, y = u
  }

  /** Projected (x, y) meters → (lonDeg, latDeg). */
  def inverse(x: Double, y: Double): (Double, Double) = {
    val v = x
    val u = y + uc
    val qp = exp(-B * v / A)
    val sp = (qp - 1.0 / qp) / 2.0
    val tp = (qp + 1.0 / qp) / 2.0
    val vp = sin(B * u / A)
    val up = (vp * cos(gamma0) + sp * sin(gamma0)) / tp
    val t = pow(E / sqrt((1.0 + up) / (1.0 - up)), 1.0 / B)
    var phi = Pi / 2.0 - 2.0 * atan(t)
    var i = 0
    while (i < 8) {
      phi = Pi / 2.0 - 2.0 * atan(
        t * pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0))
      i += 1
    }
    val lamRaw = lam0 - atan2(sp * cos(gamma0) - vp * sin(gamma0), cos(B * u / A)) / B
    val lam = atan2(sin(lamRaw), cos(lamRaw)) // normalize to (−π, π]
    (toDegrees(lam), toDegrees(phi))
  }
}

object Omerc {

  /** The reference's `centroid_to_square`: anchor an omerc at the
    * centroid, walk ±side/2 in projected meters, inverse-project.
    * Returns the 5 closed exterior coords (SW, SE, NE, NW, SW) as
    * (lonDeg, latDeg). */
  def centroidSquare(lonDeg: Double, latDeg: Double,
      sideMeters: Double = 2560.0): Seq[(Double, Double)] = {
    val p = Omerc(lonDeg, latDeg)
    val h = sideMeters / 2.0
    val corners = Seq((-h, -h), (h, -h), (h, h), (-h, h)).map { case (x, y) =>
      p.inverse(x, y)
    }
    corners :+ corners.head
  }
}
