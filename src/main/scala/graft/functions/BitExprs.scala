package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bit-level helpers for the sketch operators (SURVEY §7.5).
  *
  * `nlz_plus1(w)` = number of leading zero bits of `w`'s unsigned 64-bit
  * pattern, plus one — the HyperLogLog ρ(w) "position of the first 1-bit"
  * function (Flajolet et al. 2007). Returns 65 for w = 0 (callers clamp
  * with `least(..., 64 - p + 1)` per the HLL register-width convention).
  *
  * A native codegen'd expression (single `Long.numberOfLeadingZeros`
  * intrinsic — an LZCNT instruction after JIT) rather than a
  * `floor(log2(...))` composition: the double-precision log is not exact
  * near power-of-two boundaries above 2^53, which would corrupt register
  * values; the SQL oracle replays the same semantics with exact integer
  * comparisons against a powers-of-two table.
  */
@ExpressionDescription(
  usage = "nlz_plus1(w) - leading-zero count of the unsigned 64-bit pattern, plus 1 (HLL rho)")
case class NlzPlus1(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nlz_plus1 expects a bigint argument, got ${other.catalogString}")
    }

  override def nullSafeEval(w: Any): Any =
    java.lang.Long.numberOfLeadingZeros(w.asInstanceOf[Long]) + 1

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"java.lang.Long.numberOfLeadingZeros($w) + 1")

  override protected def withNewChildInternal(newChild: Expression): NlzPlus1 =
    copy(child = newChild)
}

/** `ntz_plus1(w)` = number of trailing zero bits plus one — the
  * first-1-bit position scanning from the LSB. Returns 65 for w = 0.
  * This is the ρ convention the HLL sketch actually uses with FNV-1a:
  * FNV's low bits avalanche well but its HIGH bits barely vary on short
  * inputs (the multiply only propagates carries upward through ~8 bytes
  * of input), so an MSB-side ρ would be degenerate — see HllSketch.
  */
@ExpressionDescription(
  usage = "ntz_plus1(w) - trailing-zero count of the 64-bit pattern, plus 1 (HLL rho)")
case class NtzPlus1(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ntz_plus1 expects a bigint argument, got ${other.catalogString}")
    }

  override def nullSafeEval(w: Any): Any =
    java.lang.Long.numberOfTrailingZeros(w.asInstanceOf[Long]) + 1

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"java.lang.Long.numberOfTrailingZeros($w) + 1")

  override protected def withNewChildInternal(newChild: Expression): NtzPlus1 =
    copy(child = newChild)
}

object BitExprs {
  def nlz_plus1(w: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NlzPlus1(ColumnBridge.expression(w)))
  }
  def ntz_plus1(w: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NtzPlus1(ColumnBridge.expression(w)))
  }
}
