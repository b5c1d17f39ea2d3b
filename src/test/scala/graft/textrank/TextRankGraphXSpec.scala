package graft.textrank

import graft.SparkSpec

class TextRankGraphXSpec extends SparkSpec {
  import spark.implicits._

  private val vertices = Seq(
    (0L, Seq("x", "x", "y")),
    (1L, Seq("x", "z")),
    (2L, Seq("y", "z")),
    (3L, Seq("x", "y", "z", "w"))).toDF("id", "tokens")

  test("GraphX backend matches the DataFrame loop on the micro graph") {
    val edges = TextRank.similarityEdges(vertices)
    val df = TextRank.ranks(edges).as[(Long, Double)].collect().toMap
    val gx = TextRankGraphX.ranks(edges).as[(Long, Double)].collect().toMap
    assert(df.keySet == gx.keySet)
    df.foreach { case (id, r) => assert(math.abs(r - gx(id)) < 1e-12, s"id=$id") }
  }

  test("edge budget exceeded falls back to the DataFrame strategy, value-identical") {
    val edges = TextRank.similarityEdges(vertices)
    val df = TextRank.ranks(edges).as[(Long, Double)].collect().toMap
    // force the budget below the micro graph's edge count: the GraphX
    // entry point must route to TextRank.ranks instead of building the
    // graph (the sf1 demonstrator envelope — its 1.1e8-edge set needs a
    // 48 GiB driver on GraphX while the default strategy fits 8 GiB)
    sys.props("graft.graphx.maxEdges") = "1"
    try {
      val fb = TextRankGraphX.ranks(edges).as[(Long, Double)].collect().toMap
      assert(fb == df)
    } finally sys.props -= "graft.graphx.maxEdges"
  }

  test("GraphX backend matches on the sf0.001 documents table") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val vertices = docs
      .filter(graft.text.TextFunctions.spaceWordCount($"text") > 10 &&
        graft.text.TextFunctions.spaceWordCount($"text") < 30)
      .select($"doc_id".as("id"),
        graft.text.TextFunctions.textrankTokens($"text", lemma = false).as("tokens"))
      .filter(org.apache.spark.sql.functions.size($"tokens") > 0)
    val edges = TextRank.similarityEdges(vertices)
    val df = TextRank.ranks(edges).as[(Long, Double)].collect().toMap
    val gx = TextRankGraphX.ranks(edges).as[(Long, Double)].collect().toMap
    assert(df.keySet == gx.keySet && df.nonEmpty)
    df.foreach { case (id, r) => assert(math.abs(r - gx(id)) < 1e-9, s"id=$id") }
  }
}
