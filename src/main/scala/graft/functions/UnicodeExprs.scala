package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization — the first stage of any multilingual
  * corpus pipeline (mixed NFC/NFD sources hash and tokenize
  * differently; accent folding unifies variant spellings before
  * dedup/search). Spark has no built-in for either, so these are
  * custom codegen'd expressions; semantics are pinned to DuckDB's
  * `nfc_normalize` / `strip_accents` (utf8proc) so the a11 gate query
  * hash-verifies them cross-engine:
  *
  *  - `nfc_normalize(s)`: canonical composition (NFC). Decomposed
  *    e+COMBINING ACUTE becomes é; already-composed text is unchanged;
  *    compatibility characters (ﬁ, ½, fullwidth) are NOT folded —
  *    canonical, not NFKC.
  *  - `strip_accents(s)`: NFD-decompose, drop non-spacing marks
  *    (category Mn), recompose NFC. 'éàü'→'eau', 'Ç'→'C'; characters
  *    with no canonical decomposition (ß, œ) and non-mark jamo (한)
  *    survive untouched.
  *
  * Both are ASCII fast-pathed: pure-ASCII input (the overwhelming case
  * in a web corpus) returns the input UTF8String without copying —
  * normalization costs nothing until a non-ASCII byte appears.
  */
object UnicodeNative {

  /** True iff every byte is < 0x80 — UTF8String stores UTF-8, so one
    * linear byte scan with no decoding.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  def nfc_normalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  }

  def strip_accents(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(StripAccents(ColumnBridge.expression(text)))
  }
}

/** Base for the string→string unicode expressions. */
abstract class UnicodeStringExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string argument, got ${other.catalogString}")
    }
}

@ExpressionDescription(
  usage = "nfc_normalize(text) - Unicode canonical composition (NFC)")
case class NfcNormalize(child: Expression) extends UnicodeStringExpr {
  override def nullSafeEval(s: Any): Any =
    UnicodeNative.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNative.nfc($s)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

@ExpressionDescription(
  usage = "strip_accents(text) - drop non-spacing marks (NFD, strip Mn, NFC)")
case class StripAccents(child: Expression) extends UnicodeStringExpr {
  override def nullSafeEval(s: Any): Any =
    UnicodeNative.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNative.stripAccents($s)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
