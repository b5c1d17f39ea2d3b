package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DigitCount, DotProduct, IntersectSize, PunctCount, SelfDot, SqDist}

/** Optimizer rule: rewrite composed-builtin patterns into the engine's
  * fused native expressions, so a user writing PLAIN declarative Spark
  * gets the fast paths without knowing they exist:
  *
  *  - `size(array_intersect(a, b))` over string arrays →
  *    `intersect_size(a, b)` (skips materializing the intersection
  *    array per row — the O(V²) TextRank inner loop);
  *  - `length(regexp_replace(text, "[^0-9]", ""))` → `digit_count`
  *    and `length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))` →
  *    `punct_count` (skip building the stripped string copy).
  *
  * Each rewrite is expression-local, null-behavior-identical and
  * type-identical (see the target expressions' docs), so it is safe
  * anywhere in any plan. Registered through `GraftExtensions`
  * (`spark.sql.extensions`) — the standard mechanism for extending
  * Catalyst without forking it.
  */
object FuseTextExpressions extends Rule[LogicalPlan] {

  private def lit(s: String): Literal = Literal(UTF8String.fromString(s), StringType)

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** The canonical fold tail of the dot/sqDist compositions:
    * zero = 0.0, merge = (acc, x) -> acc + x, finish = identity.
    */
  private object FoldSum {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(products, Literal(zero, DoubleType),
          LambdaFunction(Add(acc, el, _), Seq(lacc, lel), _),
          LambdaFunction(fin, Seq(fv), _))
          if zero == 0.0 && acc.semanticEquals(lacc) &&
            el.semanticEquals(lel) && fin.semanticEquals(fv) =>
        Some(products)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull=true makes size(NULL) return -1; IntersectSize
      // is null-propagating, so the rewrite only fires in the (default)
      // non-legacy mode where the two agree. Null ELEMENTS are fine in
      // either mode: compute() counts a shared null exactly as
      // array_intersect keeps one.
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if !legacySizeOfNull && isStringArray(a) && isStringArray(b) =>
        IntersectSize(a, b)
      case Length(RegExpReplace(t, Literal(re, StringType), Literal(rep, StringType), _))
          if rep == UTF8String.fromString("") &&
            re == UTF8String.fromString("[^0-9]") =>
        DigitCount(t)
      case Length(RegExpReplace(t, Literal(re, StringType), Literal(rep, StringType), _))
          if rep == UTF8String.fromString("") &&
            re == UTF8String.fromString("[A-Za-z0-9\\s]") =>
        PunctCount(t)
      // aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
      // -> dot_product(a, b): the embedding inner loop, per candidate
      // pair. Fold order, results and null behavior are bit-identical
      // (DotProductSpec); the fused form runs inside whole-stage codegen
      // where the HOF composition interprets a lambda per element.
      case FoldSum(ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _), Seq(zx, zy), _)))
          if isDoubleArray(a) && isDoubleArray(b) &&
            mx.semanticEquals(zx) && my.semanticEquals(zy) =>
        DotProduct(a, b)
      // aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, +) ->
      // sq_dist(a, b): the Lloyd/IVF assignment loop.
      case FoldSum(ZipWith(a, b,
          LambdaFunction(Multiply(
            Subtract(x1, y1, _), Subtract(x2, y2, _), _), Seq(zx, zy), _)))
          if isDoubleArray(a) && isDoubleArray(b) &&
            x1.semanticEquals(zx) && y1.semanticEquals(zy) &&
            x2.semanticEquals(zx) && y2.semanticEquals(zy) =>
        SqDist(a, b)
      // aggregate(a, 0.0, (acc, x) -> acc + x * x) -> self_dot(a): the
      // self-dot under every norm — identical fold (Σ xᵢ·xᵢ). The UNARY
      // target evaluates `a` exactly once, like the original aggregate,
      // so the rewrite needs no determinism guard (dot_product(a, a)
      // would codegen `a` twice — wrong for non-deterministic arrays
      // and double work for computed ones).
      case ArrayAggregate(a, Literal(zero, DoubleType),
          LambdaFunction(Add(acc, Multiply(x1, x2, _), _), Seq(lacc, lx), _),
          LambdaFunction(fin, Seq(fv), _))
          if zero == 0.0 && isDoubleArray(a) && acc.semanticEquals(lacc) &&
            x1.semanticEquals(lx) && x2.semanticEquals(lx) &&
            fin.semanticEquals(fv) =>
        SelfDot(a)
    }
}
