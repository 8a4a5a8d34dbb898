package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.UnicodeNorm

/** Contract specs for the native Unicode-normalization expressions:
  * composition, canonical reordering, the accent fold, NFKC
  * compatibility folds, and SQL-surface null/codegen behavior. Every
  * composition-sensitive literal is an explicit escape sequence -- a
  * source-file normalization pass would silently precompose raw
  * combining sequences and the asserts would go vacuous.
  * Cross-IMPLEMENTATION agreement with DuckDB's utf8proc runs through
  * the oracle-graded q_unicode_norm. */
class UnicodeNormSpec extends SparkSpec {

  private def nfc(s: String): String =
    UnicodeNorm.nfc(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    UnicodeNorm.stripAccents(UTF8String.fromString(s)).toString
  private def nfkc(s: String): String =
    UnicodeNorm.nfkc(UTF8String.fromString(s)).toString

  test("NFC composes combining sequences and reorders marks canonically") {
    assert(nfc("caf\u0065\u0301") == "caf\u00e9") // combining acute composes
    assert(nfc("caf\u00e9") == "caf\u00e9") // already normal: identity
    assert(nfc("u\u0308") == "\u00fc")
    // wrong mark order (acute ccc 230 before cedilla ccc 202) must
    // canonically reorder before composing: both spellings converge
    assert(nfc("e\u0301\u0327") == nfc("e\u0327\u0301"))
    assert(nfc("") == "")
  }

  test("strip_accents drops Mn marks and recomposes the rest") {
    assert(strip("caf\u0065\u0301 u\u0308ber ga\u0303o c\u0327a") ==
      "cafe uber gao ca")
    assert(strip("e\u0301\u0327tude") == "etude") // stacked marks both drop
    assert(strip("d\u00e9j\u00e0 vu") == "deja vu") // precomposed decomposes first
    assert(strip("plain ascii") == "plain ascii")
    assert(strip("\u00f8re") == "\u00f8re") // no decomposition: survives
  }

  test("NFKC folds compatibility forms the dedup key needs") {
    assert(nfkc("\ufb01sh") == "fish") // fi ligature
    assert(nfkc("\uff28\uff49") == "Hi") // fullwidth
    assert(nfkc("x\u00b2") == "x2") // superscript
  }

  test("SQL surface: functions registered, codegen'd, null-safe") {
    // a literal VALUES plan constant-folds to a LocalTableScan (which
    // itself proves interpreted eval works) -- drive through range()
    // so the codegen path is the one observed
    val df = spark.range(2).selectExpr(
      "CASE WHEN id = 0 THEN concat('CAF', '\u00c9') END AS s")
      .selectExpr("unicode_nfc(s) AS n",
        "strip_accents(lower(unicode_nfc(s))) AS f",
        "unicode_nfkc(s) AS k")
    val rows = df.orderBy(org.apache.spark.sql.functions.desc("n")).collect()
    assert(rows(0).getString(0) == "CAF\u00c9")
    assert(rows(0).getString(1) == "cafe")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
    // stays inside whole-stage codegen (no UDF fallback): the *(n)
    // prefix is the WholeStageCodegen stage marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicode_nfc"), plan)
  }
}
