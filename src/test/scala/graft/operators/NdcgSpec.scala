package graft.operators

import graft.SparkSpec

/** Similarity.ndcgAtK (s19). */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  private val truth = Seq(
    (0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L)
  ).toDF("query_id", "rank", "neighbor_id")

  private def ndcg(run: Seq[(Long, Int, Long)]): Double =
    Similarity.ndcgAtK(truth,
        run.toDF("query_id", "rank", "neighbor_id"), k = 3)
      .collect().head.getDouble(2)

  test("perfect ordering scores 1") {
    assert(ndcg(Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))) == 1.0)
  }

  test("reversed ordering scores below 1 but above miss-everything") {
    val rev = ndcg(Seq((0L, 1, 12L), (0L, 2, 11L), (0L, 3, 10L)))
    assert(rev > 0.0 && rev < 1.0)
    assert(ndcg(Seq((0L, 1, 90L), (0L, 2, 91L), (0L, 3, 92L))) == 0.0)
  }

  test("hand-checked value: top item at position 2") {
    // run: (miss, truth#1, truth#2): gains 0 + (2^3-1)/log2(3) + (2^2-1)/2
    val got = ndcg(Seq((0L, 1, 90L), (0L, 2, 10L), (0L, 3, 11L)))
    val idcg = 7.0 / 1.0 + 3.0 / math.log(3) * math.log(2) + 1.0 / 2.0
    val dcg = 7.0 / (math.log(3) / math.log(2)) + 3.0 / 2.0
    assert(math.abs(got - dcg / idcg) < 1e-6)
  }
}
