package graft.misc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.io.ResultSink
import graft.tfidf.TfIdf

class SqlFunctionSpec extends SparkSpec {
  import spark.implicits._

  test("intersect_size callable from SQL text after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT intersect_size(array('a','b','c'), array('b','c','d')) AS c")
      .as[Int].head()
    assert(r == 2)
  }

  test("round-3 expressions callable from SQL text after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT ntz_plus1(8L) AS a, nlz_plus1(1L) AS b,
        |lang_id('the cat and the dog is here for you') AS c,
        |nltk_stop_count(array('the', 'cat', 'and')) AS d""".stripMargin)
      .as[(Int, Int, String, Int)].head()
    assert(r == ((4, 64, "en", 2)))
  }

  test("extensions class injects the function via SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // smoke: construction + injection do not throw; full wiring is the
    // spark.sql.extensions config path exercised at session build time
  }
}

class TfMapSpec extends SparkSpec {
  import spark.implicits._

  test("map-form TF matches the reference's per-sentence count map (A1)") {
    val got = Seq(Seq("cat", "dog", "cat", "cat"))
      .toDF("tokens")
      .select(TfIdf.tfMapCol($"tokens").as("m"))
      .as[Map[String, Int]].head()
    assert(got == Map("cat" -> 3, "dog" -> 1))
  }

  test("empty token list gives empty map") {
    val got = Seq(Seq.empty[String]).toDF("tokens")
      .select(TfIdf.tfMapCol($"tokens").as("m"))
      .as[Map[String, Int]].head()
    assert(got.isEmpty)
  }
}

class ResultSinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink produces prunable hive layout") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    ResultSink.writePartitioned(docs, out, "lang")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("lang=")) == 5)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // partition pruning: only the en directory is read
    val plan = back.filter($"lang" === "en").queryExecution.executedPlan.toString
    assert(back.filter($"lang" === "en").count() ==
      docs.filter($"lang" === "en").count())
  }

  test("csv report sink round-trips a small table") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val out = java.nio.file.Files.createTempDirectory("csv").toString + "/report"
    ResultSink.writeCsvReport(df, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("id", "v"))
  }
}

class ReportSpec extends SparkSpec {
  import spark.implicits._

  test("concept report formats the reference's line (decimal-cast sigma)") {
    val concepts = Seq((0, 3.14159, "alpha beta", "R1_0,R2_1"),
        (1, 4.1, "gamma", "R3_0"))
      .toDF("concept", "singular_value", "keywords", "sentence_ids")
    val out = graft.pipeline.Pipelines.conceptReport(concepts)
      .orderBy("concept").collect()
    assert(out.map(_.getString(1)).toSeq == Seq(
      "Concept 0 [sigma=3.14] keywords: alpha beta | sentences: R1_0,R2_1",
      // fixed scale-2 print — "4.10", not "4.1" (what DuckDB prints too)
      "Concept 1 [sigma=4.10] keywords: gamma | sentences: R3_0"))
  }
}
