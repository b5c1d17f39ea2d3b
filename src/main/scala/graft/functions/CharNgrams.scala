package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(s, n)` — the sliding character n-gram array as one
  * fused expression: a drop-in for
  * `when(length(s) < n, array()).otherwise(transform(
  * sequence(1, length(s) - n + 1), i -> substr(s, i, n)))`.
  *
  * The composition (t10's bigram stage) evaluates an interpreted
  * lambda per position and — worse — `substr(s, i, n)` re-scans the
  * string from the start per call to find the codepoint offset, an
  * O(chars²) walk per document. This expression records every
  * codepoint boundary in ONE pass over the UTF-8 bytes and slices each
  * window directly from the byte buffer, so the whole array is
  * O(chars + output bytes) — with results byte-identical to the
  * codepoint-aware `substr` (n-char windows over the same boundaries).
  *
  * Null semantics mirror the composition: null string → NULL (the
  * when's condition is NULL, the otherwise's sequence bound is NULL);
  * fewer than n chars → empty array.
  */
@ExpressionDescription(
  usage = "char_ngrams(s, n) - sliding character n-gram strings")
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects a string, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    CharNgrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharNgrams.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {

  /** One boundary pass over the UTF-8 bytes, then each window sliced
    * straight from the byte buffer.
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // codepoint boundaries: offsets(k) = byte offset of char k
    val offsets = new Array[Int](bytes.length + 1)
    var chars = 0
    var b = 0
    while (b < bytes.length) {
      offsets(chars) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      chars += 1
    }
    offsets(chars) = bytes.length
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
