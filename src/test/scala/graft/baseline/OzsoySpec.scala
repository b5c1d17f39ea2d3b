package graft.baseline

import org.scalatest.funsuite.AnyFunSuite

class OzsoySpec extends AnyFunSuite {

  private val sentences = Seq(
    "the spark cluster runs the executor",
    "the cat sat on the mat",
    "spark cluster executor scaling spark cluster",
    "bananas are tasty",
    "spark executor cluster deployment")

  test("scores are non-negative and sized to input") {
    val s = OzsoyLsaSummarizer.scoreSentences(sentences)
    assert(s.size == sentences.size)
    assert(s.forall(_.score >= 0))
  }

  test("summary keeps original sentence order") {
    val out = OzsoyLsaSummarizer.summarize(sentences, topics = 2, length = 3)
    assert(out.size == 3)
    val idx = out.map(sentences.indexOf)
    assert(idx == idx.sorted)
  }

  test("dominant topic sentences outscore the outlier") {
    val s = OzsoyLsaSummarizer.scoreSentences(sentences,
      topics = 1, topicSigmaThreshold = 0.0)
    val byIdx = s.map(x => x.index -> x.score).toMap
    // sentence 2 (densest spark-cluster sentence) beats the cat sentence
    assert(byIdx(2) > byIdx(1))
  }

  test("fractional length selects a fraction of sentences") {
    val out = OzsoyLsaSummarizer.summarize(sentences, length = 0.4)
    assert(out.size == 2)
  }

  test("length = 1 selects exactly one sentence (absolute count, not fraction)") {
    assert(OzsoyLsaSummarizer.summarize(sentences, length = 1).size == 1)
  }

  test("empty and stopword-only input degrade gracefully") {
    assert(OzsoyLsaSummarizer.summarize(Nil) == Nil)
    val s = OzsoyLsaSummarizer.scoreSentences(Seq("the of and", "a an"))
    assert(s.forall(_.score == 0.0))
  }
}
