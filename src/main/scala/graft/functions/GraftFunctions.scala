package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the engine's custom Catalyst expressions.
  * `register(spark)` makes them callable from `spark.sql` text in the
  * current session; `GraftExtensions` does the same through the standard
  * `spark.sql.extensions` mechanism at session build time.
  *
  * Every builder validates its argument list up front — arity, and for
  * the `(col, n)` kernels foldability of the scalar — raising a proper
  * `AnalysisException` (standard Spark error classes) instead of the
  * `IndexOutOfBoundsException` / `ClassCastException` a raw
  * `exprs(1).eval()` would throw at plan-build time, or the bogus
  * constant it would silently produce for a deterministic non-literal.
  */
object GraftFunctions {

  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$fn`",
        "expectedNum" -> n.toString,
        "actualNum" -> exprs.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** Evaluate argument `idx` of `fn` as a compile-time Int: it must be
    * foldable (a literal or constant-foldable expression), integral
    * and non-null. Mirrors Fnv.permBuilder's Cast coercion, but with
    * the checks a catalog function is expected to make.
    */
  private def intArg(fn: String, exprs: Seq[Expression], idx: Int): Int = {
    val e = exprs(idx)
    if (!e.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$fn`",
        "paramName" -> s"`arg${idx + 1}`",
        "paramType" -> "\"INT\""))
    Cast(e, IntegerType).eval() match {
      case i: java.lang.Integer => i.intValue()
      case _ =>
        throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`arg${idx + 1}`",
          "paramType" -> "\"INT\""))
    }
  }

  /** (function name, implementing class for DESCRIBE FUNCTION, builder). */
  final case class Fn(name: String, cls: Class[_],
      build: Seq[Expression] => Expression)

  private def unary(fn: String, cls: Class[_],
      b: Expression => Expression): Fn =
    Fn(fn, cls, { exprs => arity(fn, exprs, 1); b(exprs(0)) })

  private def binary(fn: String, cls: Class[_],
      b: (Expression, Expression) => Expression): Fn =
    Fn(fn, cls, { exprs => arity(fn, exprs, 2); b(exprs(0), exprs(1)) })

  /** `fn(col, n)` with n a foldable integral scalar. */
  private def withIntArg(fn: String, cls: Class[_],
      b: (Expression, Int) => Expression): Fn =
    Fn(fn, cls, { exprs =>
      arity(fn, exprs, 2); b(exprs(0), intArg(fn, exprs, 1))
    })

  /** Single source of truth for the SQL surface: both `register` and
    * `GraftExtensions` install exactly these builders.
    */
  val builders: Seq[Fn] = Seq(
    binary("intersect_size", classOf[IntersectSize], IntersectSize(_, _)),
    unary("fnv1a64", classOf[Fnv1a64], Fnv1a64(_)),
    Fn("fnv1a_perm", classOf[Fnv1aPerm], { exprs =>
      arity("fnv1a_perm", exprs, 2); Fnv.permBuilder(exprs)
    }),
    unary("nlz_plus1", classOf[NlzPlus1], NlzPlus1(_)),
    unary("ntz_plus1", classOf[NtzPlus1], NtzPlus1(_)),
    unary("lang_id", classOf[LangIdExpr], LangIdExpr(_)),
    unary("nltk_stop_count", classOf[NltkStopCount], NltkStopCount(_)),
    unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize(_)),
    unary("strip_accents", classOf[StripAccents], StripAccents(_)),
    binary("dot_product", classOf[DotProduct], DotProduct(_, _)),
    binary("sq_dist", classOf[SqDist], SqDist(_, _)),
    unary("self_dot", classOf[SelfDot], SelfDot(_)),
    withIntArg("minhash_sig", classOf[MinHashSig], MinHashSig(_, _)),
    unary("simhash64", classOf[SimHash64], SimHash64(_)),
    withIntArg("word_shingles", classOf[WordShingles], WordShingles(_, _)),
    withIntArg("char_ngrams", classOf[CharNgrams], CharNgrams(_, _)))

  def register(spark: SparkSession): Unit =
    builders.foreach { fn =>
      ColumnBridge.registerFunction(spark, fn.name, fn.build)
    }
}

/** Use via `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.FuseTextExpressions)
    GraftFunctions.builders.foreach { fn =>
      e.injectFunction((
        new FunctionIdentifier(fn.name),
        new ExpressionInfo(fn.cls.getName, fn.name),
        fn.build))
    }
  }
}
