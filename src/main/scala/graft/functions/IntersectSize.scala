package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `intersect_size(a, b)` — the number of DISTINCT string elements the two
  * arrays share: a fused, allocation-free `size(array_intersect(a, b))`.
  * Matches `array_intersect` element semantics exactly, including nulls:
  * a null element present in BOTH arrays counts once (array_intersect
  * keeps one null in that case).
  *
  * This is the inner loop of the TextRank similarity join (SURVEY.md G2:
  * `|set(v1) & set(v2)|`, BigdataProjectCode.py:343) which runs once per
  * candidate pair — O(V²) evaluations. The built-in composition
  * materializes the intersection array per pair only to take its length;
  * this expression counts matches directly from the two `ArrayData`
  * buffers, and participates in whole-stage codegen via `doGenCode`
  * (emits a static call into `IntersectSize.compute` — no boxing, no
  * intermediate array).
  */
@ExpressionDescription(
  usage = "intersect_size(a, b) - distinct-element intersection count of two string arrays")
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_size expects two array<string> arguments, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectSize.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

object IntersectSize {

  /** Per-task-thread scratch set (r14): compute() runs once per
    * candidate pair — O(V²) calls in the TextRank join — and a fresh
    * HashSet per call made allocation the inner loop's hottest cost.
    * The set is cleared at entry and never escapes the call, so
    * thread-local reuse is observation-equivalent; capacity stays
    * bounded by the largest token set seen on the thread.
    */
  private val scratch =
    ThreadLocal.withInitial[java.util.HashSet[UTF8String]](
      () => new java.util.HashSet[UTF8String](64))

  /** Distinct-overlap count over raw ArrayData. A null element shared by
    * both sides counts exactly once — the same rule `array_intersect`
    * applies — so `intersect_size(a, b) == size(array_intersect(a, b))`
    * for every input, null elements included.
    */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = scratch.get()
    set.clear()
    var smallHasNull = false
    var i = 0
    while (i < small.numElements()) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0
    var nullPending = smallHasNull
    i = 0
    while (i < large.numElements() && (!set.isEmpty || nullPending)) {
      if (large.isNullAt(i)) {
        if (nullPending) { c += 1; nullPending = false }
      } else {
        val e = large.getUTF8String(i)
        if (set.remove(e)) c += 1
      }
      i += 1
    }
    // clear on exit too (r14 ADVICE): leftover UTF8String entries pin
    // their base objects (row buffers / cached column blocks) on the
    // task thread until the next call — release them before returning.
    // The entry clear() stays as belt-and-braces for an aborted call.
    set.clear()
    c
  }

  /** Column-level surface (Spark 4: Columns wrap ColumnNodes; the
    * conversion goes through the classic-API bridge).
    */
  def intersect_size(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(IntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
