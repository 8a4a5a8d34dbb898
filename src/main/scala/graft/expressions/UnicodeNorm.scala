package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization — the first text-cleaning step every serious
  * corpus pipeline runs (CCNet, Dolma, and C4-style dedup all NFC- or
  * NFKC-normalize before hashing: the same word with precomposed vs
  * combining accents must hash identically or exact-dedup silently
  * misses). Spark has no built-in normalizer, so these are native
  * Catalyst expressions over `java.text.Normalizer` — codegen'd via
  * static calls (the [[CosineSimilarity]] discipline), no UDF in the
  * hot path. `strip_accents` is the fold used for match keys: NFD,
  * drop combining marks (category Mn), NFC-recompose the rest —
  * byte-agreeing with DuckDB's utf8proc implementation over the
  * Latin range, which the oracle pins. */
object UnicodeNorm {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC))

  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/** `unicode_nfc(string)` → canonical-composition normal form. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_nfc expects STRING input, got ${t.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_nfc"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `unicode_nfkc(string)` → compatibility-composition normal form
  * (folds ligatures, fullwidth forms, superscripts — the aggressive
  * variant dedup keys use). */
case class NfkcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_nfkc expects STRING input, got ${t.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_nfkc"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfkc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNorm.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

/** `strip_accents(string)` → NFD, drop Mn marks, NFC-recompose. */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects STRING input, got ${t.sql}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
