package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's result under skew") {
    // heavy-tailed key histogram: key 1 holds 80% of the rows
    val big = ((1 to 800).map(i => (1L, s"v$i")) ++
      (1 to 200).map(i => ((i % 10 + 2).toLong, s"w$i"))).toDF("k", "payload")
    val small = (1L to 12L).map(k => (k, s"dim$k")).toDF("kk", "attr")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "kk", nSalts = 8)
      .select($"k", $"payload", $"attr").as[(Long, String, String)]
      .collect().sorted.toSeq
    val plain = big.join(small, $"k" === $"kk")
      .select($"k", $"payload", $"attr").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salting is deterministic across runs") {
    val big = (1 to 50).map(i => (i.toLong % 3, i)).toDF("k", "v")
    val small = (0L to 2L).map(k => (k, k * 10)).toDF("kk", "a")
    def run() = SkewJoin.saltedEquiJoin(big, small, "k", "kk", 4)
      .select($"v", $"a").as[(Int, Long)].collect().sorted.toSeq
    assert(run() == run())
  }
}
