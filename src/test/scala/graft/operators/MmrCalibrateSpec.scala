package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{CurationQueries, SimilarityQueries}

/** Behavior pins for MMR diverse selection (s10) and per-source
  * quantile calibration (c18).
  */
class MmrCalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("MMR prefers a diverse pick over a redundant higher-relevance one") {
    // query direction [1,0]; candidates at +20°, +25° and −40°. Plain
    // top-2 keeps the +20°/+25° near-pair (rel .940/.906); MMR(λ=0.5)
    // pays the cos5°≈.996 redundancy penalty on the +25° vector and
    // swaps it for the −40° one (rel .766 but only cos60°=.5 similar
    // to the first pick).
    val cands = Seq(
      (1L, Seq(0.93969, 0.34202), 0.939693),
      (2L, Seq(0.90631, 0.42262), 0.906308),
      (3L, Seq(0.76604, -0.64279), 0.766044))
      .toDF("id", "vec", "rel")
    val picked = Similarity.mmrSelect(cands, 2, 0.5)
      .select($"id").as[Long].collect().toSet
    assert(picked == Set(1L, 3L))
  }

  test("MMR at k=64 over a 10k-candidate pool stays plan-bounded") {
    // the greedy loop localCheckpoints every 8 rounds, so round i's plan
    // is O(1), not O(i) — without the cut, 64 rounds of filter+withColumn
    // stack into an analysis-time blowup
    val n = 10000
    val cands = spark.range(n).select($"id",
      array(cos($"id" * 0.001), sin($"id" * 0.001)).as("vec"),
      round(lit(1.0) / (lit(1.0) + $"id" * 0.0001), 6).as("rel"))
    val t0 = System.nanoTime()
    val picked = Similarity.mmrSelect(cands, 64, 0.5).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(picked.length == 64)
    assert(picked.map(_.getLong(1)).distinct.length == 64)
    assert(secs < 120.0, f"k=64 selection took $secs%.1f s")
  }

  test("s10 MMR scores are non-increasing down the selection order") {
    val q = SimilarityQueries.all.find(_.name == "s10_mmr").get
    val rows = q.run(spark, sf("sf0.001")).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).sameElements(1L to 5L))
    // shrinking candidate pool + pointwise-growing max-sim ⇒ each
    // round's argmax can't beat the previous round's
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getLong(1)).distinct.length == 5)
  }

  test("c18 calibration is monotone within every source") {
    val q = CurationQueries.all.find(_.name == "c18_quantile_calibrate").get
    val df = q.run(spark, sf("sf0.001"))
    val bad = df.groupBy($"source").agg(collect_list(
        struct($"quality", $"calibrated")).as("xs"))
      .select($"source", size(filter(
        // any pair where a higher raw quality got a lower calibrated score
        transform($"xs", a => size(filter($"xs", b =>
          b("quality") > a("quality") &&
            b("calibrated") < a("calibrated"))) > 0),
        x => x)).as("violations"))
      .agg(sum($"violations")).first().getLong(0)
    assert(bad == 0L)
    // calibrated values come from the global score support
    val globals = df.select($"quality").distinct().as[Double].collect().toSet
    val cals = df.select($"calibrated").distinct().as[Double].collect()
    assert(cals.forall(globals.contains))
  }
}
