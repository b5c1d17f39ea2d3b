package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordShingles — the fused shingling front of the dedup family. Pins
  * byte-equality against the when/transform/array_join/slice
  * composition it replaced, on real corpus tokens and on the corners
  * (short arrays, null elements, null array), so the swap cannot move
  * any shingle string, MinHash signature, or oracle hash.
  */
class WordShinglesSpec extends SparkSpec {

  /** The exact composition Dedup.shingles used before the fusion. */
  private def hofShingles(tokens: org.apache.spark.sql.Column, n: Int) =
    when(size(tokens) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => array_join(slice(tokens, i + 1, lit(n)), " ")))

  private def fused(tokens: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))

  test("byte-equal to the HOF composition on corpus tokens (n=3 and n=5)") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select($"doc_id",
      graft.text.TextFunctions.tokenize($"text").as("t"))
    val rows = toks.select($"doc_id",
        fused($"t", 3).as("f3"), hofShingles($"t", 3).as("h3"),
        fused($"t", 5).as("f5"), hofShingles($"t", 5).as("h5"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"n=3 doc ${r.get(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"n=5 doc ${r.get(0)}")
    }
    assert(rows.count(_.getSeq[String](1).nonEmpty) > 450)
  }

  test("corners mirror the composition") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("a", "b", "c", "d"))),
      (2L, Some(Seq("a", "b"))),           // shorter than n -> empty
      (3L, Some(Seq("a", null, "c", "d"))), // null skipped by array_join
      (4L, Some(Seq.empty[String])),
      (5L, None)                            // null array -> null
    ).toDF("id", "t")
    val rows = df.select($"id",
        fused($"t", 3).as("f"), hofShingles($"t", 3).as("h"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row $r nullness")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"row $r")
    }
    assert(rows(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(rows(1).getSeq[String](1).isEmpty)
    // the null element drops WITH its delimiter: "a c" not "a  c"
    assert(rows(2).getSeq[String](1) == Seq("a c", "c d"))
    assert(rows(4).isNullAt(1))
  }
}
