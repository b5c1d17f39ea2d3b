package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CharNgrams — the fused character-window build behind t10. Pins
  * byte-equality against the when/transform/substr composition it
  * replaced, on real (regex-stripped) corpus text, on multi-byte
  * UTF-8, and on the corners.
  */
class CharNgramsSpec extends SparkSpec {

  private def hofNgrams(s: org.apache.spark.sql.Column, n: Int) =
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - n + 1),
        i => s.substr(i, lit(n))))

  private def fused(s: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CharNgrams(org.apache.spark.sql.graft.ColumnBridge.expression(s), n))

  test("byte-equal to the HOF composition on corpus text (n=2 and n=3)") {
    import spark.implicits._
    val c = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", regexp_replace(lower($"text"), "[^a-z]", "").as("c"))
    val rows = c.select($"doc_id",
        fused($"c", 2).as("f2"), hofNgrams($"c", 2).as("h2"),
        fused($"c", 3).as("f3"), hofNgrams($"c", 3).as("h3"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"n=2 doc ${r.get(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"n=3 doc ${r.get(0)}")
    }
  }

  test("multi-byte codepoints and corners mirror the composition") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("héllo wörld")),   // 2-byte codepoints: é ö
      (2L, Some("日本語テキスト")), // 3-byte codepoints
      (3L, Some("a")),             // shorter than n -> empty
      (4L, Some("")),
      (5L, None)                   // null -> null
    ).toDF("id", "c")
    val rows = df.select($"id", fused($"c", 2).as("f"), hofNgrams($"c", 2).as("h"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row $r nullness")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"row $r")
    }
    assert(rows(1).getSeq[String](1).head == "日本")
    assert(rows(2).getSeq[String](1).isEmpty && rows(3).getSeq[String](1).isEmpty)
    assert(rows(4).isNullAt(1))
  }
}
