package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(tokens, n)` — the "a b c" word n-gram array as one
  * fused expression: a drop-in for
  * `when(size(tokens) < n, array()) .otherwise(transform(
  * sequence(0, size - n), i -> array_join(slice(tokens, i+1, n), " ")))`.
  *
  * Shingling is the scan-stage front of every MinHash/Jaccard/dup-gram
  * operator (d03-d06, d10, d15-d19, d26, tr06, sm13, sk06, c34/c36, the
  * dup-gram routes): the composition runs three nested interpreted
  * HOFs and allocates a slice array per window; this expression slides
  * one window over the `ArrayData` buffer and concatenates UTF8String
  * bytes directly (no java.lang.String round-trip), producing
  * byte-identical shingle strings.
  *
  * Null semantics mirror the composition (spec-pinned in
  * WordShinglesSpec): null tokens array → NULL (size(NULL) < n is NULL,
  * the when falls to otherwise, whose transform over a NULL sequence is
  * NULL); fewer than n tokens → empty array; null ELEMENTS inside a
  * window are skipped by array_join along with their delimiter (an
  * all-null window joins to the empty string).
  */
@ExpressionDescription(
  usage = "word_shingles(tokens, n) - space-joined word n-gram strings")
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(tokens: Any): Any =
    WordShingles.compute(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordShingles.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Space = UTF8String.fromString(" ")

  /** Sliding n-window over the token buffer; each window joined with a
    * single space, null elements skipped with their delimiter (the
    * array_join rule).
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val parts = new Array[UTF8String](2 * n - 1)
    var i = 0
    while (i <= m - n) {
      var k = 0
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (k > 0) { parts(k) = Space; k += 1 }
          parts(k) = tokens.getUTF8String(i + j)
          k += 1
        }
        j += 1
      }
      out(i) = UTF8String.concat(java.util.Arrays.copyOfRange(parts, 0, k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
