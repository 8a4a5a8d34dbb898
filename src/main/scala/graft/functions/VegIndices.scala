package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The reference's 17-index vegetation library
  * (src/common_ci.py:87-180 `calculate_indices`; normalizedDifference =
  * (a−b)/(a+b)), re-expressed as SQL expression strings.
  *
  * One formula table serves both engines: the Spark side evaluates
  * `expr(formula)` (Catalyst-parsed, codegen'd — stays inside
  * whole-stage codegen, no UDF), and the DuckDB oracle splices the
  * exact same text, so results agree bit-for-bit. Divisions are
  * guarded (`CASE WHEN denom <> 0`) because Spark 4 runs ANSI mode
  * (div-by-zero errors) while the reference relies on EE's masked
  * semantics — NULL is our mask (SURVEY §7.3 hard-part 6). The
  * reference's `** 2` becomes explicit self-multiplication so both
  * engines do one IEEE multiply instead of a `pow` libm call.
  */
object VegIndices {

  private def div(num: String, den: String): String =
    s"(CASE WHEN ($den) <> 0 THEN ($num) / ($den) ELSE NULL END)"

  /** normalizedDifference(a, b) */
  private def nd(a: String, b: String): String = div(s"($a) - ($b)", s"($a) + ($b)")

  /** All 17 indices as (name, formula) given band expressions.
    * Band roles: B2=blue, B3=green, B4=red, B8A=redEdge, B8=nir,
    * B11=swir1, B12=swir2. */
  def formulas(blue: String, green: String, red: String, redEdge: String,
               nir: String, swir1: String, swir2: String): Seq[(String, String)] = Seq(
    "ndvi" -> nd(nir, red),
    "gndvi" -> nd(nir, green),
    "evi" -> div(s"2.5 * (($nir) - ($red))", s"($nir) + 6 * ($red) - 7.5 * ($blue) + 1"),
    "evi2" -> div(s"2.5 * (($nir) - ($red))", s"($nir) + 2.4 * ($red) + 1"),
    "arvi" -> div(s"($nir) - (2 * ($red) - ($blue))", s"($nir) + (2 * ($red) - ($blue))"),
    "ndre" -> nd(nir, redEdge),
    "ndmi" -> nd(nir, swir1),
    "msavi" -> s"(2 * ($nir) + 1 - sqrt((2 * ($nir) + 1) * (2 * ($nir) + 1) - 8 * (($nir) - ($red)))) / 2",
    "mndwi" -> nd(green, swir1),
    "ndwi" -> nd(green, swir1), // reference computes NDWI with the same bands as MNDWI (common_ci.py:134-135)
    "ndbi" -> nd(swir1, nir),
    "sr" -> div(nir, red),
    "bsi" -> div(s"($swir1) + ($red) - (($nir) + ($blue))", s"($swir1) + ($red) + ($nir) + ($blue)"),
    "nbwi" -> nd(nir, swir1),
    "wetness" -> s"0.1509 * ($nir) + 0.1973 * ($swir1) + 0.3279 * ($swir2)",
    "brightness" -> s"0.2043 * ($blue) + 0.4158 * ($green) + 0.5524 * ($red)",
    "greenness" -> s"($nir) - (($red) + ($green))",
  )

  /** Column API: indices from band columns (by name). */
  def columns(blue: String, green: String, red: String, redEdge: String,
              nir: String, swir1: String, swir2: String): Seq[Column] =
    formulas(blue, green, red, redEdge, nir, swir1, swir2)
      .map { case (name, f) => expr(f).as(name) }
}
