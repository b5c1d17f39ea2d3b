package graft.operators

import graft.SparkSpec

/** Dedup.removeRepeatedSpans — the exact-substring CUT step (d20).
  * k=8 keeps the planted windows small enough to reason about by hand;
  * positions are 1-based to match substr on both engines.
  */
class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "0123456789abcdefghij" // 20 chars, planted in 2 docs

  private val docs = Seq(
    (0L, "XX" + shared + "YYQQRRSSTT"),
    (1L, "PQ" + shared + "ZZKKLLMMNN"),
    (2L, "totally independent content here"),
    (3L, "ABCDEFGH__ABCDEFGH"), // within-doc repeat, two disjoint spans
    (4L, "short") // below k, no grams
  ).toDF("doc_id", "text")

  private lazy val out =
    Dedup.removeRepeatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("cross-doc shared block is excised as one merged span") {
    // doc 0: shared occupies 1-based [3, 22]; dup window starts 3..15
    // merge to exactly that interval -> clean = flanks only
    assert(out(0L) == ((1L, 20L, "XX" + "YYQQRRSSTT")))
    assert(out(1L) == ((1L, 20L, "PQ" + "ZZKKLLMMNN")))
  }

  test("within-doc repeat cuts both occurrences as separate spans") {
    // positions 1 and 11: 11 > 1+7 -> two spans [1,8],[11,18]
    assert(out(3L) == ((2L, 16L, "__")))
  }

  test("unique and sub-k docs pass through untouched") {
    assert(out(2L) == ((0L, 0L, "totally independent content here")))
    assert(out(4L) == ((0L, 0L, "short")))
  }
}
