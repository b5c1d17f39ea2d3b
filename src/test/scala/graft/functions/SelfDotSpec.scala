package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SelfDot — the fused UNARY Σx² under every norm. Pins bit-equality
  * against BOTH forms it replaces (the aggregate fold and
  * dot_product(a, a)) plus the null corners, and the single-evaluation
  * contract that motivated it (a non-deterministic child must be
  * evaluated exactly once). Also covers the SQL-surface argument
  * validation added with it (clean AnalysisException for wrong arity /
  * non-foldable scalar args, ADVICE r8).
  */
class SelfDotSpec extends SparkSpec {

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  private def fused(a: org.apache.spark.sql.Column) = bridge(SelfDot(expr(a)))

  test("bit-equal to the aggregate fold and dot_product(a, a) on real vectors") {
    import spark.implicits._
    val v = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id",
        graft.operators.Similarity.toDouble($"embedding").as("v"))
    val rows = v.select($"vec_id",
        fused($"v").as("f"),
        aggregate($"v", lit(0.0), (acc, x) => acc + x * x).as("h"),
        bridge(DotProduct(expr($"v"), expr($"v"))).as("d"))
      .collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val Seq(f, h, d) = Seq(1, 2, 3).map(i =>
        java.lang.Double.doubleToRawLongBits(r.getDouble(i)))
      assert(f == h, s"vec ${r.get(0)}: fused vs HOF fold")
      assert(f == d, s"vec ${r.get(0)}: fused vs dot_product(a, a)")
    }
  }

  test("null corners mirror the aggregate fold") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq[java.lang.Double](3.0, 4.0))),
      (2L, Some(Seq.empty[java.lang.Double])),
      (3L, None),
      (4L, Some(Seq[java.lang.Double](1.0, null, 2.0)))
    ).toDF("id", "a")
    val rows = df.select($"id", fused($"a").as("f"),
        aggregate($"a", lit(0.0), (acc, x) => acc + x * x).as("h"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row $r nullness")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2), s"row $r")
    }
    assert(rows(0).getDouble(1) == 25.0)
    assert(rows(1).getDouble(1) == 0.0)       // empty -> 0.0, not null
    assert(rows(2).isNullAt(1))               // null array -> null
    assert(rows(3).isNullAt(1))               // null element -> null
  }

  test("a non-deterministic child is evaluated exactly once") {
    import spark.implicits._
    // Σx² over shuffle(a) is permutation-invariant, so ONE evaluation
    // always yields exactly 14.0 for [1,2,3]. A double evaluation (the
    // old dot_product(a, a) route) would pair two INDEPENDENT
    // permutations elementwise — Σ x_σ(i)·x_τ(i), e.g. 1·2+2·1+3·3=13.
    // 200 rows make an accidental all-aligned pass astronomically
    // unlikely under double evaluation.
    val df = (1 to 200).map(_ => Tuple1(Seq(1.0, 2.0, 3.0))).toDF("a")
      .repartition(2)
    val rows = df.select(fused(shuffle($"a")).as("n2")).collect()
    rows.foreach(r => assert(!r.isNullAt(0) && r.getDouble(0) == 14.0))
  }

  test("self_dot is callable from SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT self_dot(array(1.0d, 2.0d)) AS n2").collect().head
    assert(r.getDouble(0) == 5.0)
  }

  test("wrong arity / non-foldable scalar args raise clean AnalysisException") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Seq("a", "b"), 2)).toDF("t", "n").createOrReplaceTempView("sdv")
    // arity: word_shingles wants exactly 2 args
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(t) FROM sdv").collect()
    }
    assert(e1.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", e1.toString)
    // foldability: a COLUMN as the n argument must not be evaluated
    // against no row (the old builder threw from exprs(1).eval())
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(t, n) FROM sdv").collect()
    }
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT", e2.toString)
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT minhash_sig(array(1L), n) FROM sdv").collect()
    }
    assert(e3.getCondition == "NON_FOLDABLE_ARGUMENT", e3.toString)
    // a foldable NON-literal still works (mirrors Fnv.permBuilder)
    val ok = spark.sql("SELECT char_ngrams('abcd', 1 + 1) AS g").collect().head
    assert(ok.getSeq[String](0) == Seq("ab", "bc", "cd"))
  }
}
