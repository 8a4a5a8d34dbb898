package graft.functions

/** Transverse Mercator / UTM (Snyder, "Map Projections — A Working
  * Manual", USGS PP 1395, pp. 60-64, series form) — the reference's
  * real projected CRS pair: its Senegal rasters live in UTM zone 28N
  * and `Transformer.from_crs` / `.reproject(crs='EPSG:4326',
  * scale=10)` move between UTM and geographic coordinates
  * (presto_modeling.py:86-91; monthly.py:334-337).
  *
  * Two faces, one algorithm:
  *
  *  - [[Tmerc.forward]]/[[Tmerc.inverse]]: scalar libm math for
  *    driver-side geometry and for the spec's independence check.
  *  - [[Tmerc.pipeline]]: the SAME forward series as a staged list of
  *    (column name, SQL expression) strings over pure IEEE arithmetic
  *    (+ - * / sqrt and a pinned-coefficient Horner polynomial for
  *    sin/cos — no libm trig, whose last-ulp behavior differs across
  *    engines). The IDENTICAL strings run through Spark `expr()` and
  *    the DuckDB oracle, so E/N agree BIT-FOR-BIT cross-engine: the
  *    q_reproject_utm hash compares doubles exactly. Polynomial
  *    truncation error is ~1 ulp for |φ| ≤ 84° — TmercSpec pins the
  *    Column series against the independent libm scalar to < 1 mm and
  *    the scalar against a Simpson-integrated meridian arc to < 1 m.
  *
  * Everything is codegen-friendly Column math: at 100 TB the CRS
  * mapping fuses into the target-grid projection stage of
  * [[graft.operators.Reproject.reprojectBilinear]] with no UDF and no
  * shuffle of its own.
  */
object Tmerc {

  // WGS84 / UTM constants, pinned once; their shortest-repr decimal
  // forms are embedded into the shared SQL so both engines start from
  // the same doubles
  val A: Double = 6378137.0
  val F: Double = 1.0 / 298.257223563
  val E2: Double = F * (2.0 - F)
  val Ep2: Double = E2 / (1.0 - E2)
  val K0: Double = 0.9996
  val FalseEasting: Double = 500000.0
  private val D2R = math.Pi / 180.0

  // meridian-arc series coefficients M(φ) = A·(M0·φ − M2·sin2φ +
  // M4·sin4φ − M6·sin6φ)
  val M0: Double = 1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0
  val M2: Double = 3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 * E2 * E2 / 1024.0
  val M4: Double = 15.0 * E2 * E2 / 256.0 + 45.0 * E2 * E2 * E2 / 1024.0
  val M6: Double = 35.0 * E2 * E2 * E2 / 3072.0

  /** UTM zone central meridian, degrees (zone 28 → −15). */
  def centralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  // ---------------------------------------------------------- scalar
  /** Meridian arc length from the equator (series form). */
  def meridianArc(phi: Double): Double =
    A * (M0 * phi - M2 * math.sin(2 * phi) + M4 * math.sin(4 * phi) -
      M6 * math.sin(6 * phi))

  /** Scalar forward: (lonDeg, latDeg) → (easting, northing) meters in
    * the zone with central meridian `lon0Deg` (northern convention —
    * add 1e7 to northing for the southern hemisphere yourself). */
  def forward(lonDeg: Double, latDeg: Double, lon0Deg: Double): (Double, Double) = {
    import math._
    val phi = latDeg * D2R
    val sp = sin(phi); val cp = cos(phi)
    val t = tan(phi); val tt = t * t
    val cc = Ep2 * cp * cp
    val aa = (lonDeg - lon0Deg) * D2R * cp
    val nu = A / sqrt(1.0 - E2 * sp * sp)
    val aa2 = aa * aa; val aa3 = aa2 * aa
    val e = FalseEasting + K0 * nu * (aa + (1 - tt + cc) * aa3 / 6.0 +
      (5 - 18 * tt + tt * tt + 72 * cc - 58 * Ep2) * aa3 * aa2 / 120.0)
    val n = K0 * (meridianArc(phi) + nu * t * (aa2 / 2.0 +
      (5 - tt + 9 * cc + 4 * cc * cc) * aa2 * aa2 / 24.0 +
      (61 - 58 * tt + tt * tt + 600 * cc - 330 * Ep2) * aa3 * aa3 / 720.0))
    (e, n)
  }

  /** Scalar inverse: (easting, northing) → (lonDeg, latDeg) via the
    * footpoint-latitude series (Snyder eq. 3-26, 8-12..8-25). */
  def inverse(easting: Double, northing: Double, lon0Deg: Double): (Double, Double) = {
    import math._
    val m = northing / K0
    val mu = m / (A * M0)
    val e1 = (1.0 - sqrt(1.0 - E2)) / (1.0 + sqrt(1.0 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * e1 * e1 * e1 / 32) * sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * e1 * e1 * e1 * e1 / 32) * sin(4 * mu) +
      (151 * e1 * e1 * e1 / 96) * sin(6 * mu) +
      (1097 * e1 * e1 * e1 * e1 / 512) * sin(8 * mu)
    val sp = sin(phi1); val cp = cos(phi1)
    val t1 = tan(phi1); val tt = t1 * t1
    val c1 = Ep2 * cp * cp
    val r1 = A * (1.0 - E2) / pow(1.0 - E2 * sp * sp, 1.5)
    val n1 = A / sqrt(1.0 - E2 * sp * sp)
    val dd = (easting - FalseEasting) / (n1 * K0)
    val dd2 = dd * dd
    val phi = phi1 - (n1 * t1 / r1) * (dd2 / 2.0 -
      (5 + 3 * tt + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * dd2 * dd2 / 24.0 +
      (61 + 90 * tt + 298 * c1 + 45 * tt * tt - 252 * Ep2 - 3 * c1 * c1) *
        dd2 * dd2 * dd2 / 720.0)
    val lam = (dd - (1 + 2 * tt + c1) * dd2 * dd / 6.0 +
      (5 - 2 * c1 + 28 * tt - 3 * c1 * c1 + 8 * Ep2 + 24 * tt * tt) *
        dd2 * dd2 * dd / 120.0) / cp
    (lon0Deg + lam / D2R, phi / D2R)
  }

  // ------------------------------------------------- shared SQL face
  // Pinned Taylor coefficients (shortest double repr — both engines
  // parse the same values). Truncation at x^19/x^18 keeps ~1 ulp for
  // |x| ≤ 1.47 rad (84°), far inside the ±1 m bar.
  private val SinC = Seq(
    "1.0", "-0.16666666666666666", "0.008333333333333333",
    "-0.0001984126984126984", "2.7557319223985893e-06",
    "-2.505210838544172e-08", "1.6059043836821613e-10",
    "-7.647163731819816e-13", "2.8114572543455206e-15",
    "-8.22063524662433e-18")
  private val CosC = Seq(
    "1.0", "-0.5", "0.041666666666666664", "-0.001388888888888889",
    "2.48015873015873e-05", "-2.755731922398589e-07",
    "2.08767569878681e-09", "-1.1470745597729725e-11",
    "4.779477332387385e-14", "-1.5619206968586225e-16")

  private def horner(sq: String, cs: Seq[String]): String =
    cs.reverse.reduceLeft((acc, c) => s"($c + ($sq) * ($acc))")

  /** sin(x)/cos(x) of a SQL expression as the pinned polynomial. */
  def sinSql(x: String): String = s"(($x) * ${horner(s"($x) * ($x)", SinC)})"
  def cosSql(x: String): String = horner(s"($x) * ($x)", CosC)

  /** Shortest-repr double literal with a FORCED exponent marker: a
    * bare decimal like `6378137.0` parses as DECIMAL in DuckDB, whose
    * arithmetic overflows on literal×literal products (and whose
    * decimal→double conversion can drift a ulp); `...e0` parses as a
    * double in both engines. */
  private def d(v: Double): String = {
    val s = v.toString
    if (s.contains('E')) s.replace("E", "e")
    else if (s.contains('e')) s
    else s + "e0"
  }

  /** The forward series as dependency-ordered stages of (name, SQL
    * expression): feed columns `lon`/`lat` (degrees); yields `utm_e`
    * and `utm_n`. Spark applies each stage with `expr`; the oracle
    * nests one CTE per stage — the identical arithmetic tree on both
    * engines makes the result bit-exact. */
  def pipeline(lon0Deg: Double): Seq[Seq[(String, String)]] = Seq(
    Seq(
      "tm_phi" -> s"(lat * ${d(D2R)})",
      "tm_dlam" -> s"((lon - ${d(lon0Deg)}) * ${d(D2R)})"),
    Seq(
      "tm_sp" -> sinSql("tm_phi"),
      "tm_cp" -> cosSql("tm_phi")),
    Seq(
      "tm_t" -> "(tm_sp / tm_cp)",
      "tm_aa" -> "(tm_dlam * tm_cp)",
      "tm_s2p" -> "(2.0 * tm_sp * tm_cp)",
      "tm_c2p" -> "(1.0 - 2.0 * tm_sp * tm_sp)",
      "tm_nu" -> s"(${d(A)} / sqrt(1.0 - ${d(E2)} * tm_sp * tm_sp))"),
    Seq(
      "tm_tt" -> "(tm_t * tm_t)",
      "tm_cc" -> s"(${d(Ep2)} * tm_cp * tm_cp)",
      "tm_aa2" -> "(tm_aa * tm_aa)",
      "tm_s4p" -> "(2.0 * tm_s2p * tm_c2p)",
      "tm_c4p" -> "(1.0 - 2.0 * tm_s2p * tm_s2p)"),
    Seq(
      "tm_s6p" -> "(tm_s2p * tm_c4p + tm_c2p * tm_s4p)",
      "tm_aa3" -> "(tm_aa2 * tm_aa)"),
    Seq(
      "tm_m" -> (s"(${d(A)} * (${d(M0)} * tm_phi - ${d(M2)} * tm_s2p" +
        s" + ${d(M4)} * tm_s4p - ${d(M6)} * tm_s6p))")),
    Seq(
      "utm_e" -> (s"(${d(FalseEasting)} + ${d(K0)} * tm_nu * (tm_aa" +
        " + (1.0 - tm_tt + tm_cc) * tm_aa3 / 6.0" +
        " + (5.0 - 18.0 * tm_tt + tm_tt * tm_tt + 72.0 * tm_cc" +
        s" - 58.0 * ${d(Ep2)}) * tm_aa3 * tm_aa2 / 120.0))"),
      "utm_n" -> (s"(${d(K0)} * (tm_m + tm_nu * tm_t * (tm_aa2 / 2.0" +
        " + (5.0 - tm_tt + 9.0 * tm_cc + 4.0 * tm_cc * tm_cc)" +
        " * tm_aa2 * tm_aa2 / 24.0" +
        " + (61.0 - 58.0 * tm_tt + tm_tt * tm_tt + 600.0 * tm_cc" +
        s" - 330.0 * ${d(Ep2)}) * tm_aa3 * tm_aa3 / 720.0)))"))
  )

  /** The oracle half: wrap `innerSql` (which must expose `lon` and
    * `lat` columns) in one CTE per pipeline stage, ending with every
    * original column plus `utm_e`/`utm_n`. */
  def pipelineSql(innerSql: String, lon0Deg: Double): String =
    stagesSql(innerSql, pipeline(lon0Deg))

  private def stagesSql(innerSql: String,
      stages: Seq[Seq[(String, String)]]): String =
    stages.foldLeft(s"($innerSql)") { (acc, stage) =>
      val cols = stage.map { case (n, e) => s"$e AS $n" }.mkString(", ")
      s"(SELECT *, $cols FROM $acc)"
    }

  /** The INVERSE series (footpoint latitude, Snyder 3-26/8-12..8-25)
    * in the same shared-SQL discipline: feed columns `utm_e`/`utm_n`
    * (meters, northern convention); yields `lon`/`lat` (degrees).
    * sin/cos run through the pinned polynomials on the footpoint
    * angles, so results stay bit-exact cross-engine. */
  def inversePipeline(lon0Deg: Double): Seq[Seq[(String, String)]] = {
    val e1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
    val j1 = 3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0
    val j2 = 21.0 * e1 * e1 / 16.0 - 55.0 * e1 * e1 * e1 * e1 / 32.0
    val j3 = 151.0 * e1 * e1 * e1 / 96.0
    val j4 = 1097.0 * e1 * e1 * e1 * e1 / 512.0
    Seq(
      Seq("ti_mu" -> s"((utm_n / ${d(K0)}) / (${d(A)} * ${d(M0)}))"),
      Seq(
        "ti_smu" -> sinSql("ti_mu"),
        "ti_cmu" -> cosSql("ti_mu")),
      Seq(
        "ti_s2u" -> "(2.0 * ti_smu * ti_cmu)",
        "ti_c2u" -> "(1.0 - 2.0 * ti_smu * ti_smu)"),
      Seq(
        "ti_s4u" -> "(2.0 * ti_s2u * ti_c2u)",
        "ti_c4u" -> "(1.0 - 2.0 * ti_s2u * ti_s2u)"),
      Seq(
        "ti_s6u" -> "(ti_s2u * ti_c4u + ti_c2u * ti_s4u)",
        "ti_s8u" -> "(2.0 * ti_s4u * ti_c4u)"),
      Seq(
        "ti_fp" -> (s"(ti_mu + ${d(j1)} * ti_s2u + ${d(j2)} * ti_s4u" +
          s" + ${d(j3)} * ti_s6u + ${d(j4)} * ti_s8u)")),
      Seq(
        "ti_sp" -> sinSql("ti_fp"),
        "ti_cp" -> cosSql("ti_fp")),
      Seq(
        "ti_t" -> "(ti_sp / ti_cp)",
        "ti_w2" -> s"(1.0 - ${d(E2)} * ti_sp * ti_sp)"),
      Seq(
        "ti_tt" -> "(ti_t * ti_t)",
        "ti_cc" -> s"(${d(Ep2)} * ti_cp * ti_cp)",
        "ti_n1" -> s"(${d(A)} / sqrt(ti_w2))",
        "ti_r1" -> s"(${d(A)} * ${d(1.0 - E2)} / (ti_w2 * sqrt(ti_w2)))"),
      Seq(
        "ti_dd" -> s"((utm_e - ${d(FalseEasting)}) / (ti_n1 * ${d(K0)}))"),
      Seq("ti_dd2" -> "(ti_dd * ti_dd)"),
      Seq(
        "lat" -> (s"((ti_fp - (ti_n1 * ti_t / ti_r1) * (ti_dd2 / 2.0" +
          " - (5.0 + 3.0 * ti_tt + 10.0 * ti_cc - 4.0 * ti_cc * ti_cc" +
          s" - 9.0 * ${d(Ep2)}) * ti_dd2 * ti_dd2 / 24.0" +
          " + (61.0 + 90.0 * ti_tt + 298.0 * ti_cc + 45.0 * ti_tt * ti_tt" +
          s" - 252.0 * ${d(Ep2)} - 3.0 * ti_cc * ti_cc)" +
          s" * ti_dd2 * ti_dd2 * ti_dd2 / 720.0)) / ${d(D2R)})"),
        "lon" -> (s"(${d(lon0Deg)} + ((ti_dd" +
          " - (1.0 + 2.0 * ti_tt + ti_cc) * ti_dd2 * ti_dd / 6.0" +
          " + (5.0 - 2.0 * ti_cc + 28.0 * ti_tt - 3.0 * ti_cc * ti_cc" +
          s" + 8.0 * ${d(Ep2)} + 24.0 * ti_tt * ti_tt)" +
          s" * ti_dd2 * ti_dd2 * ti_dd / 120.0) / ti_cp) / ${d(D2R)})"))
    )
  }

  /** Oracle wrapper for [[inversePipeline]]. */
  def inversePipelineSql(innerSql: String, lon0Deg: Double): String =
    stagesSql(innerSql, inversePipeline(lon0Deg))
}
