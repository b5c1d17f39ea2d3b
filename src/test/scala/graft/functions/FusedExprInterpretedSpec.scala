package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused expressions under the INTERPRETED evaluator: Spark falls
  * back to `eval()` when whole-stage codegen is disabled (or a plan
  * exceeds codegen limits), and constant-folding hits `eval()` even in
  * codegen mode — so the interpreted and generated paths must agree.
  * Each fused expression is run over the same inputs with
  * whole-stage codegen ON and with codegen fully OFF
  * (`NO_CODEGEN` factory), and the results must be identical.
  */
class FusedExprInterpretedSpec extends SparkSpec {

  private def withNoCodegen[T](f: => T): T = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  private def bridge(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
  private def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  test("codegen and interpreted paths agree for every fused expression") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60)
    val base = docs.select($"doc_id",
      graft.text.TextFunctions.tokenize($"text").as("t"),
      regexp_replace(lower($"text"), "[^a-z]", "").as("c"))
    val vecs = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(60)
      .select($"vec_id",
        graft.operators.Similarity.toDouble($"embedding").as("v"))

    def textCols(d: org.apache.spark.sql.DataFrame) = d.select($"doc_id",
      bridge(WordShingles(expr($"t"), 3)).as("sh"),
      bridge(SimHash64(expr($"t"))).as("sim"),
      bridge(CharNgrams(expr($"c"), 2)).as("bg"),
      bridge(MinHashSig(expr(graft.operators.Dedup.shingleHashes(
        graft.operators.Dedup.shingles($"t", 3))), 16)).as("sig"))
      .orderBy($"doc_id").collect().toSeq
    def vecCols(d: org.apache.spark.sql.DataFrame) = d.select($"vec_id",
      bridge(DotProduct(expr($"v"), expr($"v"))).as("d"),
      bridge(SelfDot(expr($"v"))).as("sd"),
      bridge(SqDist(expr($"v"), expr(reverse($"v")))).as("s"))
      .orderBy($"vec_id").collect().toSeq

    val (tGen, vGen) = (textCols(base), vecCols(vecs))
    val (tInt, vInt) = withNoCodegen((textCols(base), vecCols(vecs)))
    assert(tGen == tInt, "text expressions diverge between codegen and eval")
    vGen.zip(vInt).foreach { case (g, i) =>
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(i.getDouble(1)), s"dot: $g vs $i")
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(i.getDouble(2)), s"sqd: $g vs $i")
    }
  }
}
