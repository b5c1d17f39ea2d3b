package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{DigitCount, IntersectSize, PunctCount}

/** FuseTextExpressions optimizer rule: plain declarative Spark
  * (`size(array_intersect(..))`, `length(regexp_replace(..))`) must be
  * rewritten to the engine's fused native expressions with identical
  * results, including null behavior.
  */
class FuseSpec extends SparkSpec {

  /** Run `f` with the fusion rule active on the shared session. */
  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FuseTextExpressions
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == FuseTextExpressions)
  }

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), "ab1, c2; d3!"),
      (Seq.empty[String], Seq("x"), ""),
      (null, Seq("x"), null),
      (Seq("x"), null, "no digits here...")
    ).toDF("xs", "ys", "text")
      // Barrier: without it ConvertToLocalRelation evaluates the whole
      // projection at optimization time and there is no plan to inspect.
      .repartition(2)
  }

  test("size(array_intersect) fuses to IntersectSize with equal results") {
    val q = docs.select(size(array_intersect(col("xs"), col("ys"))).as("n"))
    val plain = q.collect().toSeq
    withRule {
      val fusedQ = docs.select(size(array_intersect(col("xs"), col("ys"))).as("n"))
      val optimized = fusedQ.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[IntersectSize])),
        s"expected IntersectSize in:\n$optimized")
      assert(fusedQ.collect().toSeq == plain)
    }
  }

  test("length(regexp_replace) digit/punct patterns fuse with equal results") {
    def q = docs.select(
      length(regexp_replace(col("text"), "[^0-9]", "")).as("digits"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("punct"))
    val plain = q.collect().toSeq
    withRule {
      val optimized = q.queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DigitCount])),
        s"expected DigitCount in:\n$optimized")
      assert(optimized.expressions.exists(_.exists(_.isInstanceOf[PunctCount])),
        s"expected PunctCount in:\n$optimized")
      assert(q.collect().toSeq == plain)
    }
  }

  test("non-matching regex replacement is left alone") {
    withRule {
      val q = docs.select(
        length(regexp_replace(col("text"), "[^0-9]", "X")).as("n"))
      val optimized = q.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[DigitCount])),
        s"unexpected DigitCount in:\n$optimized")
    }
  }

  test("fused and unfused results agree on randomized inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // ~1 in 9 elements is a null: the rewrite must preserve
    // array_intersect's shared-null-counts-once rule too.
    def arr(): Seq[String] =
      Seq.fill(rnd.nextInt(6)) {
        val v = rnd.nextInt(9); if (v == 8) null else v.toString
      }
    def txt(): String =
      Seq.fill(rnd.nextInt(40))(
        "ab1!,; \t.Z9".charAt(rnd.nextInt(11))).mkString
    val rows = (1 to 300).map(_ => (arr(), arr(), txt()))
    val df = rows.toDF("xs", "ys", "text").repartition(3)
    def q(d: org.apache.spark.sql.DataFrame) = d.select(
      size(array_intersect(col("xs"), col("ys"))).as("n"),
      length(regexp_replace(col("text"), "[^0-9]", "")).as("digits"),
      length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).as("punct"))
    val plain = q(df).collect().toSeq
    val fused = withRule(q(df).collect().toSeq)
    assert(fused == plain)
  }

  test("legacy sizeOfNull mode disables the rewrite (size(null) = -1)") {
    withRule {
      // Under ANSI (the Spark 4 default) Size always ignores the legacy
      // flag, so legacy mode requires ANSI off as well.
      spark.conf.set("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
      try {
        val q = docs.select(size(array_intersect(col("xs"), col("ys"))).as("n"))
        assert(!q.queryExecution.optimizedPlan.expressions
          .exists(_.exists(_.isInstanceOf[IntersectSize])),
          s"rewrite must not fire under legacy sizeOfNull:\n${q.queryExecution.optimizedPlan}")
        // Rows whose input array is null must keep the legacy -1.
        assert(q.collect().map(_.getInt(0)).count(_ == -1) == 2)
      } finally {
        spark.conf.unset("spark.sql.legacy.sizeOfNull")
        spark.conf.unset("spark.sql.ansi.enabled")
      }
    }
  }

  test("non-string arrays are left alone") {
    import spark.implicits._
    withRule {
      val q = Seq((Seq(1, 2), Seq(2, 3))).toDF("xs", "ys").repartition(2)
        .select(size(array_intersect(col("xs"), col("ys"))).as("n"))
      assert(!q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[IntersectSize])))
      assert(q.collect().map(_.getInt(0)).toSeq == Seq(1))
    }
  }

  test("HOF dot product / squared distance fuse with bit-equal results") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Seq[Double] = Seq.fill(16)(rnd.nextDouble() * 2 - 1)
    val df = (1 to 200).map(_ => (vec(), vec())).toDF("a", "b").repartition(3)
    def q(d: org.apache.spark.sql.DataFrame) = d.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dot"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("sqd"))
    val plain = q(df).collect().toSeq
    withRule {
      val optimized = q(df).queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct])),
        s"expected DotProduct in:\n$optimized")
      assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.SqDist])),
        s"expected SqDist in:\n$optimized")
      val fused = q(df).collect().toSeq
      // bit-equality, not approximate: the fused fold order is identical
      plain.zip(fused).foreach { case (pr, fr) =>
        assert(java.lang.Double.doubleToRawLongBits(pr.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(fr.getDouble(0)))
        assert(java.lang.Double.doubleToRawLongBits(pr.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(fr.getDouble(1)))
      }
    }
  }

  test("a non-dot fold (wrong zero / wrong merge) is left alone") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").repartition(1)
    withRule {
      // zero = 1.0, merge subtracts: neither pattern may fire
      val q = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(1.0), (acc, x) => acc + x).as("z1"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc - x).as("z2"))
      val optimized = q.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.DotProduct])),
        s"unexpected DotProduct in:\n$optimized")
    }
  }

  test("self-dot norm fold fuses to the UNARY self_dot(a) bit-equal") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = (1 to 100).map(_ => Tuple1(Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("a").repartition(2)
    def q(d: org.apache.spark.sql.DataFrame) = d.select(
      aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("n2"))
    val plain = q(df).collect().toSeq
    withRule {
      val optimized = q(df).queryExecution.optimizedPlan
      assert(optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.SelfDot])),
        s"expected SelfDot in:\n$optimized")
      q(df).collect().toSeq.zip(plain).foreach { case (fr, pr) =>
        assert(java.lang.Double.doubleToRawLongBits(fr.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(pr.getDouble(0)))
      }
    }
  }

  // ---- MinHash/shingling family (round-9) ----

  /** The exact HOF compositions the fused kernels replaced (same
    * builders the graft.functions kernel specs pin bit-equality
    * against).
    */
  private def hofShingles(tokens: org.apache.spark.sql.Column, n: Int) =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))

  private def hofNgrams(s: org.apache.spark.sql.Column, n: Int) =
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - n + 1),
        i => s.substr(i, lit(n))))

  private def hofSig(hashes: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(hashes,
        h => graft.functions.Fnv.fnv1a_perm(i.cast("int"), h))))

  private def hofSimhash(tokens: org.apache.spark.sql.Column) = {
    val hs = transform(tokens, t => graft.functions.Fnv.fnv1a64(t))
    aggregate(
      sequence(lit(0L), lit(63L)),
      lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(
          aggregate(hs, lit(0),
            (v, h) => v + when(
              call_function("shiftrightunsigned", h, i)
                .bitwiseAND(lit(1L)) === lit(1L), 1).otherwise(-1)) > 0,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))))
  }

  test("MinHash-family HOF compositions fuse to the kernels, results equal") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(120)
      .select($"doc_id", graft.text.TextFunctions.tokenize($"text").as("t"),
        regexp_replace(lower($"text"), "[^a-z]", "").as("c"))
      .withColumn("hv", graft.operators.Dedup.shingleHashes(
        graft.operators.Dedup.shingles($"t", 3)))
      .localCheckpoint() // freeze inputs so plain/fused read identical rows
    def q(d: org.apache.spark.sql.DataFrame) = d.select($"doc_id",
      hofShingles($"t", 3).as("sh"),
      hofNgrams($"c", 2).as("bg"),
      hofSig($"hv", 16).as("sig"),
      hofSimhash($"t").as("sim"))
      .orderBy($"doc_id")
    val plain = q(docs).collect().toSeq
    withRule {
      val optimized = q(docs).queryExecution.optimizedPlan
      for ((cls, label) <- Seq(
          classOf[graft.functions.WordShingles] -> "WordShingles",
          classOf[graft.functions.CharNgrams] -> "CharNgrams",
          classOf[graft.functions.MinHashSig] -> "MinHashSig",
          classOf[graft.functions.SimHash64] -> "SimHash64"))
        assert(optimized.exists(_.expressions.exists(_.exists(e => cls.isInstance(e)))),
          s"expected $label in:\n$optimized")
      assert(q(docs).collect().toSeq == plain)
    }
  }

  test("MinHash-family near-miss compositions are left alone") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq(42L, 7L))).toDF("t", "hv")
      .repartition(1)
    withRule {
      // wrong join delimiter; sequence not starting at 0; non-identity
      // permutation order — none may fire
      val q = df.select(
        when(size($"t") < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size($"t") - 2),
            i => array_join(slice($"t", i + 1, lit(2)), "_"))).as("a"),
        transform(sequence(lit(1), lit(4)),
          i => array_min(transform($"hv",
            h => graft.functions.Fnv.fnv1a_perm(i.cast("int"), h)))).as("b"))
      val optimized = q.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.WordShingles])),
        s"unexpected WordShingles in:\n$optimized")
      assert(!optimized.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.MinHashSig])),
        s"unexpected MinHashSig in:\n$optimized")
    }
  }

  test("a NON-DETERMINISTIC child blocks the MinHash-family rewrites") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "b", "c"))).toDF("t").repartition(1)
    withRule {
      // the composition evaluates shuffle(t) per outer element; the
      // fused kernel would evaluate it once — different semantics
      val q = df.select(hofShingles(shuffle($"t"), 2).as("sh"),
        hofSimhash(shuffle($"t")).as("sim"))
      val optimized = q.queryExecution.optimizedPlan
      assert(!optimized.expressions.exists(_.exists(e =>
        e.isInstanceOf[graft.functions.WordShingles] ||
          e.isInstanceOf[graft.functions.SimHash64])),
        s"unexpected fused kernel in:\n$optimized")
    }
  }

  test("fused MinHash-family null corners equal the compositions") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b")), Some("ab"), Some(Seq(42L))),
      (2L, Some(Seq.empty[String]), Some(""), Some(Seq.empty[Long])),
      (3L, None, None, None),
      (4L, Some(Seq("a", null, "b")), Some("a"), Some(Seq(7L, -1L)))
    ).toDF("id", "t", "c", "hv").repartition(2)
    def q(d: org.apache.spark.sql.DataFrame) = d.select($"id",
      hofShingles($"t", 2).as("sh"), hofNgrams($"c", 2).as("bg"),
      hofSig($"hv", 4).as("sig"), hofSimhash($"t").as("sim"))
      .orderBy($"id")
    val plain = q(df).collect().toSeq
    val fused = withRule(q(df).collect().toSeq)
    assert(fused == plain)
  }

  test("self-dot rewrite is safe for a NON-DETERMINISTIC array (single eval)") {
    import spark.implicits._
    // shuffle(a) is non-deterministic; the unary SelfDot target
    // evaluates it once, exactly like the original aggregate — and the
    // sum of squares is permutation-invariant, so the value must equal
    // the sorted-array self-dot regardless of the order produced.
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("a").repartition(1)
    withRule {
      val q = df.select(
        aggregate(shuffle(col("a")), lit(0.0), (acc, x) => acc + x * x).as("n2"))
      assert(q.queryExecution.optimizedPlan.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.SelfDot])))
      assert(q.collect().head.getDouble(0) == 14.0)
    }
  }
}
