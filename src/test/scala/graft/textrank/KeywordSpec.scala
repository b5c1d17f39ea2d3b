package graft.textrank

import graft.SparkSpec
import graft.queries.{AnalysisQueries, TextRankQueries}

/** Invariants for the word-graph TextRank keywords (tr07) and the
  * shingle-novelty audit (a22) on the sf0.001 fixture. Value-level
  * correctness is oracle-checked by the gate; these pin the structural
  * properties a user relies on.
  */
class KeywordSpec extends SparkSpec {

  private def run(name: String) = {
    val q = TextRankQueries.all ++ AnalysisQueries.all
    q.find(_.name == name).get.run(spark, sf("sf0.001"))
  }

  test("tr07 keyword ranks are damped-PageRank-shaped") {
    val rows = run("tr07_keywords").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val ranks = rows.map(_.getDouble(1))
    // every vertex keeps at least the (1-d) floor, and the output is
    // sorted by rank descending (id ascending within ties)
    assert(ranks.forall(_ >= 0.15))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    // keywords are actual filtered-vocabulary words: >=4 chars, no stopword
    val words = rows.map(_.getString(0))
    assert(words.forall(w => w.length >= 4 && w.forall(_.isLetter)))
    assert(words.forall(w => !graft.text.StopWords.nltkEnglishAlpha.contains(w)))
  }

  test("a22 novelty is a fraction of the doc's own shingles") {
    val rows = run("a22_novelty").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val u = r.getLong(2); val f = r.getDouble(3)
      assert(n > 0 && u >= 0 && u <= n)
      assert(f >= 0.0 && f <= 1.0)
      assert(math.abs(f - math.round(u * 1.0 / n * 1e6) / 1e6) < 1e-9)
    }
  }
}
