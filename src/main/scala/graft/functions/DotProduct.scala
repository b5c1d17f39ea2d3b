package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)` — the double-array dot product as one fused,
  * allocation-free, whole-stage-codegen expression: a drop-in for
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`.
  *
  * This is the inner loop of every embedding operator — the O(n²)
  * brute-force cosine truth baselines (d06, s01), SemDeDup's in-cluster
  * pairs (d12), the ANN verify legs — evaluated once per CANDIDATE PAIR.
  * The higher-order-function composition it replaces cannot participate
  * in whole-stage codegen (lambda functions are interpreted) and
  * materializes the zipped products array per pair; this expression
  * streams both `ArrayData` buffers through one primitive loop.
  *
  * Bit-compatibility contract (spec-pinned in DotProductSpec): the
  * accumulation is the IDENTICAL strict left fold — s = ((0.0 + a₀·b₀)
  * + a₁·b₁) + … — so results are bit-equal to the HOF composition and
  * the DuckDB oracles' `list_reduce(list_prepend(0.0, …))` replays.
  * Null semantics mirror the composition too: a null array, a null
  * element on either side, or unequal lengths (zip_with pads with null)
  * all yield NULL; two empty arrays yield 0.0.
  */
@ExpressionDescription(
  usage = "dot_product(a, b) - strict left-fold dot product of two double arrays")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects two array<double> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("dotRes")
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            java.lang.Double $boxed = graft.functions.DotProduct.compute(
              ${leftGen.value}, ${rightGen.value});
            if ($boxed != null) {
              ${ev.isNull} = false;
              ${ev.value} = $boxed.doubleValue();
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Strict left-fold dot product over raw ArrayData; null (boxed) on
    * length mismatch or any null element — exactly what the
    * aggregate-over-zip_with composition returns in those cases.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** `sq_dist(a, b)` — fold-identical squared euclidean distance, the
  * fused form of `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0,
  * (acc, x) -> acc + x)`. This is the Lloyd assignment inner loop
  * (evaluated nVectors × nClusters times per iteration across the
  * IVF/PQ/IVFADC/SemDeDup family); the summation order is the one the
  * DuckDB oracles' `list_reduce` replays, so argmin assignments stay
  * bit-identical cross-engine. Same null semantics as [[DotProduct]].
  */
@ExpressionDescription(
  usage = "sq_dist(a, b) - strict left-fold squared euclidean distance of two double arrays")
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sq_dist expects two array<double> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    SqDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("sqdRes")
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            java.lang.Double $boxed = graft.functions.SqDist.compute(
              ${leftGen.value}, ${rightGen.value});
            if ($boxed != null) {
              ${ev.isNull} = false;
              ${ev.value} = $boxed.doubleValue();
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

/** `self_dot(a)` — Σ xᵢ·xᵢ as one UNARY fused expression: a drop-in
  * for `aggregate(a, 0.0, (acc, x) -> acc + x * x)` (the self-dot fold
  * under every norm) and for `dot_product(a, a)`.
  *
  * Why a separate expression when `DotProduct(a, a)` computes the same
  * value: a binary expression codegens its two children INDEPENDENTLY
  * (subexpression elimination across operands is not guaranteed), so
  * `dot_product(expr, expr)` evaluates the array-producing child twice
  * per row — double work for a computed array, and a semantic change
  * for a non-deterministic one (the two evaluations can disagree,
  * yielding NULL on the length check or a nonsense sum). The unary
  * form evaluates the child exactly once, which also lets the
  * `FuseTextExpressions` self-dot rewrite stay valid without a
  * determinism guard.
  *
  * Fold order and null semantics are bit-identical to the aggregate
  * composition (SelfDotSpec): null array or any null element → NULL,
  * empty array → 0.0, s = ((0.0 + x₀·x₀) + x₁·x₁) + … .
  */
@ExpressionDescription(
  usage = "self_dot(a) - strict left-fold sum of squares of a double array")
case class SelfDot(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"self_dot expects an array<double> argument, got ${other.catalogString}")
    }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null else SelfDot.compute(a.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("sdotRes")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed = graft.functions.SelfDot.compute(
            ${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SelfDot =
    copy(child = newChild)
}

object SelfDot {

  /** Strict left-fold Σ xᵢ² over raw ArrayData — the array buffer is
    * walked ONCE; null (boxed) on any null element, exactly what the
    * aggregate fold returns there (acc + null·null poisons the fold).
    */
  def compute(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

object SqDist {

  /** Strict left-fold Σ(aᵢ−bᵢ)² over raw ArrayData; null (boxed) on
    * length mismatch or any null element.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
