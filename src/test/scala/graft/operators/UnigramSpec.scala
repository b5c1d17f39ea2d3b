package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the cheapest segmentation") {
    val nll = Map("a" -> 2.0, "b" -> 2.1, "ab" -> 1.0, "ba" -> 5.0)
    // abab: ab|ab (2.0) beats a|ba|b (9.1) and a|b|a|b (8.2)
    assert(Unigram.segment("abab", nll, 6) == List("ab", "ab"))
    // ba: b|a (4.1) beats ba (5.0)
    assert(Unigram.segment("ba", nll, 6) == List("b", "a"))
  }

  test("equal-cost tie goes to the earliest predecessor (longest piece)") {
    val nll = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    // j=0 ("ab", 2.0) ties j=1 ("a"+"b", 2.0): first minimum wins
    assert(Unigram.segment("ab", nll, 6) == List("ab"))
  }

  test("missing pieces fall back to covered paths") {
    val nll = Map("a" -> 1.0, "b" -> 1.0)
    assert(Unigram.segment("aba", nll, 2) == List("a", "b", "a"))
  }

  test("train segments every word exactly and prunes unused pieces") {
    val wf = Seq(("spark", 10L), ("spar", 4L), ("park", 6L), ("ark", 2L))
      .toDF("word", "freq")
    val out = Unigram.train(spark, wf, vocabSize = 32, maxLen = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val pieces = out.map(_._1).toSet
    assert(out.forall(_._2 > 0)) // hard-EM drops unused pieces
    // usage mass conservation: total piece usage covers every char of
    // every word occurrence at least once segmentation-wise: the
    // weighted piece count equals the weighted segment count, which is
    // at most total chars and at least total words
    val totalUse = out.map(_._2).sum
    assert(totalUse >= 22L && totalUse <= Seq(10L * 5, 4L * 4, 6L * 4, 2L * 3).sum)
    // every word must be segmentable purely from surviving pieces
    val nll = out.map(t => t._1 -> t._3).toMap
    Seq("spark", "spar", "park", "ark").foreach { w =>
      val seg = Unigram.segment(w, nll, 6)
      assert(seg.mkString == w)
      assert(seg.forall(pieces))
    }
  }
}
