package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `simhash64(tokens)` — the 64-bit SimHash signature as one fused
  * expression: a drop-in for the HOF composition in `Dedup.simhash`
  * (an outer fold over the 64 bit positions, each with an inner
  * ±1-vote fold over every token hash — O(64 × |tokens|) interpreted
  * lambda dispatches per document). This expression hashes each token
  * once ([[Fnv.hashUtf8]], the same static the `fnv1a64` expression
  * compiles to) and scatters its 64 votes in a primitive loop, then
  * assembles the sign-correct long exactly like the OR-of-powers
  * combination (bit 63 wraps into the sign bit).
  *
  * Null semantics mirror the composition: a null tokens array makes
  * every per-bit inner aggregate NULL, whose `> 0` test is NULL, so
  * every `when` takes the otherwise(0) branch — result 0L. A null
  * ELEMENT makes its shifted-bit test NULL, which votes −1 on every
  * bit (the when's otherwise branch), and an empty array yields 0L
  * (no vote is > 0). All spec-pinned in SimHash64Spec.
  */
@ExpressionDescription(
  usage = "simhash64(tokens) - 64-bit FNV-voted SimHash of a string array")
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${other.catalogString}")
    }

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    SimHash64.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""
        long ${ev.value} = graft.functions.SimHash64.compute(
          ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Per-bit ±1 votes over the token FNV hashes; bit set iff its vote
    * sum is strictly positive. Null array → 0L (every per-bit vote sum
    * is NULL in the composition, so no bit is set); a null element
    * votes −1 on every bit.
    */
  def compute(tokens: ArrayData): Long = {
    if (tokens == null) return 0L
    val votes = new Array[Int](64)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      if (tokens.isNullAt(i)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val h = Fnv.hashUtf8(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
