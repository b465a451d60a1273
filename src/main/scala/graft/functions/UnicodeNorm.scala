package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus keys (UAX #15 via the JDK's
  * `java.text.Normalizer` — the Unicode-standard algorithm, no external
  * ICU): a multilingual crawl carries BOTH encodings of visually
  * identical text ("é" arrives precomposed U+00E9 from one site and
  * decomposed e+U+0301 from another), so every byte-grain key in the
  * dedup stack — md5 content hashes, MinHash shingles, URL canonical
  * forms, exact-match decontamination — silently misses the cross-form
  * duplicates unless text is NFC-normalized FIRST. `stripMarks`
  * additionally folds diacritics away (NFD → drop combining marks →
  * NFC), the aggressive variant for fuzzy linkage keys where "resume"
  * should meet "résumé".
  *
  * Both are codegen'd unary expressions (one static call, no UDF
  * boxing); ASCII fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation and short-circuits the rewrite for the overwhelmingly-
  * ASCII bulk of a real crawl. */
object UnicodeNorm {

  def nfcString(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** NFD → remove combining marks (general category Mn) → NFC. */
  def stripMarksString(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    nfcString(sb.toString)
  }

  def nfc(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(NfcNormalizeExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))

  def stripMarks(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(StripMarksExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

/** Shared STRING → STRING normalizer expression shape: null-intolerant,
  * one static [[UnicodeNorm]] call in both the interpreted and the
  * codegen path (`staticFn` names the static method the generated Java
  * invokes — it must match `applyFn`). */
sealed abstract class UnaryStringNormExpr extends UnaryExpression {
  protected def staticFn: String
  protected def applyFn: String => String
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  protected override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(applyFn(s.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.UnicodeNorm.$staticFn($c.toString()));
       """.stripMargin
    })
}

/** STRING → STRING NFC normalization; null-intolerant, codegen'd. */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryStringNormExpr {
  override def prettyName: String = "nfc_normalize"
  protected def staticFn: String = "nfcString"
  protected def applyFn: String => String = UnicodeNorm.nfcString
  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}

/** STRING → STRING diacritic folding; null-intolerant, codegen'd. */
case class StripMarksExpr(child: Expression)
    extends UnaryStringNormExpr {
  override def prettyName: String = "strip_marks"
  protected def staticFn: String = "stripMarksString"
  protected def applyFn: String => String = UnicodeNorm.stripMarksString
  override protected def withNewChildInternal(
      newChild: Expression): StripMarksExpr = copy(child = newChild)
}
