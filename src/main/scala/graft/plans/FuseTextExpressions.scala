package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharNgrams, DigitCount, DotProduct, Fnv1a64, Fnv1aPerm, IntersectSize, MinHashSig, PunctCount, SelfDot, SimHash64, SqDist, WordShingles}

/** Optimizer rule: rewrite composed-builtin patterns into the engine's
  * fused native expressions, so a user writing PLAIN declarative Spark
  * gets the fast paths without knowing they exist:
  *
  *  - `size(array_intersect(a, b))` over string arrays →
  *    `intersect_size(a, b)` (skips materializing the intersection
  *    array per row — the O(V²) TextRank inner loop);
  *  - `length(regexp_replace(text, "[^0-9]", ""))` → `digit_count`
  *    and `length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))` →
  *    `punct_count` (skip building the stripped string copy);
  *  - the embedding folds → `dot_product` / `sq_dist` / `self_dot`;
  *  - the MinHash/shingling HOF compositions → `word_shingles` /
  *    `char_ngrams` / `minhash_sig` / `simhash64` (the compute-bound
  *    scan stages of the dedup family; the compositions interpret a
  *    lambda per element and re-evaluate their array child inside an
  *    outer loop, the kernels run one codegen'd pass).
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

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** `[0, 1, …, n-1]` as it appears in an optimized plan: either the
    * constant-folded literal array (the usual case — `sequence(lit(0),
    * lit(n-1))` folds before this rule sees it) or an unfolded
    * `Sequence` with literal bounds. Returns n (≥ 1).
    */
  private def constIndexSeq(e: Expression): Option[Int] = e match {
    case Literal(a: ArrayData, ArrayType(IntegerType, _)) =>
      val n = a.numElements()
      if (n >= 1 && (0 until n).forall(i => !a.isNullAt(i) && a.getInt(i) == i))
        Some(n) else None
    case Literal(a: ArrayData, ArrayType(LongType, _)) =>
      val n = a.numElements()
      if (n >= 1 && (0 until n).forall(i => !a.isNullAt(i) && a.getLong(i) == i.toLong))
        Some(n) else None
    case Sequence(Literal(s, _), Literal(t, _), step, _)
        if stepIsOne(step) && numEq(s, 0L) =>
      asLong(t).collect { case nm1 if nm1 >= 0 && nm1 < 100000 => nm1.toInt + 1 }
    case _ => None
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case _ => None
  }

  private def numEq(v: Any, x: Long): Boolean = asLong(v).contains(x)

  private def stepIsOne(o: Option[Expression]): Boolean = o match {
    case None => true
    case Some(Literal(v, _)) => numEq(v, 1L)
    case _ => false
  }

  /** A cast to int/long inserted by type coercion (or written by the
    * user) around a lambda variable that already carries the value —
    * e.g. `cast(i as int)` over a bigint sequence element.
    */
  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, IntegerType, _, _) => c
    case Cast(c, LongType, _, _) => c
    case _ => e
  }

  private def isEmptyStringArrayLit(e: Expression): Boolean = e match {
    case Literal(a: ArrayData, ArrayType(StringType, _)) => a.numElements() == 0
    case _ => false
  }

  private def intLit(e: Expression): Option[Int] = e match {
    case Literal(i: java.lang.Integer, IntegerType) => Some(i.intValue())
    case _ => None
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

      // ---- The MinHash/shingling family (round-9): the plain HOF
      // compositions the fused kernels replaced (pinned bit-equal in
      // WordShinglesSpec / MinHashSigSpec / SimHash64Spec /
      // CharNgramsSpec) are rewritten here so a user writing them
      // declaratively gets the same fused scan path Dedup's own
      // operators ride. All four targets evaluate their array/string
      // child ONCE; the compositions evaluate it n× (it sits inside an
      // outer lambda) — hence the `.deterministic` guards: fewer
      // evaluations of a non-deterministic child would change results.

      // when(size(t) < n, array()).otherwise(transform(
      //   sequence(0, size(t) - n), i -> array_join(slice(t, i+1, n), " ")))
      // -> word_shingles(t, n)
      case CaseWhen(
          Seq((LessThan(Size(t1, false), nLit), emptyLit)),
          Some(ArrayTransform(
            Sequence(zLit, Subtract(Size(t2, false), nLit2, _), step, _),
            LambdaFunction(
              ArrayJoin(
                Slice(t3, Add(iRef, oneLit, _), nLit3),
                Literal(sp, StringType), None),
              Seq(iV), _))))
          if intLit(nLit).exists(n => n >= 1 &&
              intLit(nLit2).contains(n) && intLit(nLit3).contains(n)) &&
            intLit(zLit).contains(0) && intLit(oneLit).contains(1) &&
            stepIsOne(step) && sp == UTF8String.fromString(" ") &&
            isStringArray(t1) && isEmptyStringArrayLit(emptyLit) &&
            t1.semanticEquals(t2) && t1.semanticEquals(t3) &&
            t1.deterministic && iRef.semanticEquals(iV) &&
            !t1.exists(_.semanticEquals(iV)) =>
        WordShingles(t1, intLit(nLit).get)

      // when(length(s) < n, array()).otherwise(transform(
      //   sequence(1, length(s) - n + 1), i -> substr(s, i, n)))
      // -> char_ngrams(s, n)
      case CaseWhen(
          Seq((LessThan(Length(s1), nLit), emptyLit)),
          Some(ArrayTransform(
            Sequence(oneLit, stop, step, _),
            LambdaFunction(Substring(s3, iRef, nLit3), Seq(iV), _))))
          if intLit(nLit).exists(n => n >= 1 && intLit(nLit3).contains(n) &&
              ngramStopMatches(stop, s1, n)) &&
            intLit(oneLit).contains(1) && stepIsOne(step) &&
            s1.dataType == StringType && isEmptyStringArrayLit(emptyLit) &&
            s1.semanticEquals(s3) && s1.deterministic &&
            iRef.semanticEquals(iV) && !s1.exists(_.semanticEquals(iV)) =>
        CharNgrams(s1, intLit(nLit).get)

      // transform(sequence(0, n-1), i ->
      //   array_min(transform(hashes, h -> fnv1a_perm(i, h))))
      // -> minhash_sig(hashes, n)
      case ArrayTransform(seqL, LambdaFunction(
          ArrayMin(ArrayTransform(hashes, LambdaFunction(
            Fnv1aPerm(iArg, hArg), Seq(hV), _))),
          Seq(iV), _))
          if constIndexSeq(seqL).isDefined && isLongArray(hashes) &&
            hashes.deterministic &&
            stripCast(iArg).semanticEquals(iV) &&
            stripCast(hArg).semanticEquals(hV) &&
            !hashes.exists(_.semanticEquals(iV)) =>
        MinHashSig(hashes, constIndexSeq(seqL).get)

      // aggregate(sequence(0, 63), 0L, (acc, i) -> acc |
      //   if(aggregate(transform(tokens, t -> fnv1a64(t)), 0, (v, h) ->
      //        v + if((shiftrightunsigned(h, i) & 1) = 1, 1, -1)) > 0,
      //      shiftleft(1L, i), 0L))
      // -> simhash64(tokens)
      case ArrayAggregate(seqL, Literal(zeroL, LongType),
          LambdaFunction(
            BitwiseOr(accRef, CaseWhen(Seq((
              GreaterThan(
                ArrayAggregate(
                  ArrayTransform(tokens,
                    LambdaFunction(Fnv1a64(tRef), Seq(tV), _)),
                  Literal(zeroI, IntegerType),
                  LambdaFunction(
                    Add(vRef, CaseWhen(Seq((
                      EqualTo(
                        BitwiseAnd(
                          ShiftRightUnsigned(hRef, iCast1),
                          Literal(one1, LongType)),
                        Literal(one2, LongType)),
                      posLit)), Some(negLit)), _),
                    Seq(vV, hV), _),
                  LambdaFunction(idRef, Seq(idV), _)),
                zeroCmp),
              ShiftLeft(Literal(lone, LongType), iCast2))),
              Some(Literal(zElse, LongType)))),
            Seq(accV, iV), _),
          LambdaFunction(finRef, Seq(finV), _))
          if zeroL == 0L && zeroI == 0 && one1 == 1L && one2 == 1L &&
            intLit(posLit).contains(1) && intLit(negLit).contains(-1) &&
            lone == 1L && zElse == 0L && intLit(zeroCmp).contains(0) &&
            constIndexSeq(seqL).contains(64) &&
            isStringArray(tokens) && tokens.deterministic &&
            accRef.semanticEquals(accV) && tRef.semanticEquals(tV) &&
            vRef.semanticEquals(vV) && hRef.semanticEquals(hV) &&
            stripCast(iCast1).semanticEquals(iV) &&
            stripCast(iCast2).semanticEquals(iV) &&
            idRef.semanticEquals(idV) && finRef.semanticEquals(finV) &&
            !tokens.exists(_.semanticEquals(iV)) =>
        SimHash64(tokens)
    }

  /** The stop bound of the char-ngram sequence, `length(s) - n + 1`,
    * in the shapes the optimizer leaves it in.
    */
  private def ngramStopMatches(stop: Expression, s: Expression, n: Int): Boolean =
    stop match {
      case Add(Subtract(Length(s2), aLit, _), bLit, _) =>
        s2.semanticEquals(s) &&
          (for (a <- intLit(aLit); b <- intLit(bLit)) yield a - b == n - 1)
            .getOrElse(false)
      case Subtract(Length(s2), aLit, _) =>
        s2.semanticEquals(s) && intLit(aLit).contains(n - 1)
      case Length(s2) => s2.semanticEquals(s) && n == 1
      case _ => false
    }
}
