package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes, n)` — the whole n-element MinHash signature as
  * one fused expression: a drop-in for
  * `transform(sequence(0, n-1), i -> array_min(transform(hashes,
  * h -> fnv1a_perm(i, h))))`.
  *
  * The composition is the compute-bound stage of every MinHash operator
  * (d04/d10/d15/d26, tr06, sm13): O(n × |shingles|) work per document,
  * but as higher-order functions it runs through interpreted lambdas
  * and materializes n permuted arrays per row only to take their mins.
  * This expression calls the SAME static [[Fnv.hashPerm]] the
  * `fnv1a_perm` expression compiles to, in one primitive double loop
  * with a single output allocation — so every signature value is
  * bit-identical to the composition and to the DuckDB oracles that
  * replay the FNV family in HUGEINT arithmetic.
  *
  * Null semantics mirror the composition EXACTLY — including the
  * non-obvious corner that a NULL input array does NOT null the result:
  * the outer transform runs over `sequence(0, n-1)` (never null), and
  * each inner `array_min(transform(NULL, …))` is a null ELEMENT, so the
  * composition returns an n-element all-null array. Likewise an empty
  * array (array_min of empty = null) and all-null elements. Null
  * elements inside a non-empty array are skipped by the min.
  */
@ExpressionDescription(
  usage = "minhash_sig(hashes, n) - n-element FNV-permutation MinHash signature")
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if numHashes >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckFailure(s"numHashes must be >= 1, got $numHashes")
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got ${other.catalogString}")
    }

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinHashSig.compute(
      child.eval(input).asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code +
        code"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.MinHashSig.compute(
            ${childGen.isNull} ? null : ${childGen.value}, $numHashes);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  /** Signature element i = signed-long min over non-null hashes of
    * Fnv.hashPerm(i, h); null when no non-null hash exists. A null
    * `hashes` behaves as empty (see the expression doc — the HOF
    * composition returns all-null elements, never a null array).
    */
  def compute(hashes: ArrayData, n: Int): ArrayData = {
    val m = if (hashes == null) 0 else hashes.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      var best = 0L
      var seen = false
      var j = 0
      while (j < m) {
        if (!hashes.isNullAt(j)) {
          val v = Fnv.hashPerm(i, hashes.getLong(j))
          if (!seen || v < best) { best = v; seen = true }
        }
        j += 1
      }
      out(i) = if (seen) java.lang.Long.valueOf(best) else null
      i += 1
    }
    new GenericArrayData(out)
  }
}
