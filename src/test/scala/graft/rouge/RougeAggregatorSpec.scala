package graft.rouge

import graft.SparkSpec

class RougeAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    ("the cat sat", "the cat ran"),
    ("go go go", "go go stop"),
    ("alpha beta", "gamma delta"))

  test("aggregator mean equals map-then-avg (A7)") {
    val agg = pairs.toDS().select(RougeMean.rouge1(stem = false).toColumn).head()
    val direct = pairs.map { case (s, r) => Rouge.rougeN(s, r, 1) }
    val n = direct.size.toDouble
    assert(math.abs(agg.precision - direct.map(_.precision).sum / n) < 1e-12)
    assert(math.abs(agg.recall - direct.map(_.recall).sum / n) < 1e-12)
    assert(math.abs(agg.f1 - direct.map(_.f1).sum / n) < 1e-12)
  }

  test("per-group means via groupByKey") {
    val ds = Seq(
      ("g1", "the cat sat", "the cat ran"),
      ("g1", "x y", "x z"),
      ("g2", "aa bb", "cc dd")).toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(RougeMean.rougeL(stem = false).toColumn)
      .collect().toMap
    assert(out("g2").f1 == 0.0)
    assert(out("g1").f1 > 0.0)
  }

  test("empty input yields zero score, not NaN") {
    val agg = Seq.empty[(String, String)].toDS()
      .select(RougeMean.rouge2(stem = true).toColumn).head()
    assert(agg == Rouge.Score(0, 0, 0))
  }
}
