package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins the dedup-family degenerate-corpus mass probe (r13 verdict
  * task 2): STRESS_r13 measured d04/d15's pre-shuffle partial
  * aggregates pressing 7.94–7.97 g at sf10 on the replica-degenerate
  * corpus with OOM projected at ~sf15 (~490 M post-cap pairs). The
  * probe (Dedup object docs) measures the exact post-cap pair mass
  * above a doc-count floor and, over a heap-derived budget, swaps the
  * pair stream to output-sized partitioning. Contract pinned here:
  *  - the bounded route is VALUE-IDENTICAL to the default route (for
  *    d04's candidate distinct, d05's simhash chunk-band pairs and
  *    d15's quantized cosine) — the reroute moves partitioning, never
  *    answers;
  *  - the route decision is exactly mass > budget;
  *  - `-Dgraft.dedup.massReroute=off` turns a tripped probe into a
  *    loud IllegalStateException carrying the measured evidence;
  *  - below the floor the optimized plan is byte-identical to the
  *    probe-less shape (no injected exchange).
  */
class DedupMassProbeSpec extends SparkSpec {
  import spark.implicits._

  // replica-degenerate fixture in miniature: every "document" is the
  // same token set, so every signature collides in every band (the
  // sf10 stress corpus's 100-near-identical-copies shape)
  private def degenerateSigs(n: Int): DataFrame =
    (0L until n.toLong).map(i => (i, Seq.fill(8)(42L))).toDF("id", "sig")

  private def withProps(kv: (String, String)*)(body: => Unit): Unit = {
    kv.foreach { case (k, v) => System.setProperty(k, v) }
    try body
    finally kv.foreach { case (k, _) => System.clearProperty(k) }
  }

  test("route decision is exactly mass > budget") {
    assert(Dedup.massRoute("spec", 101L, 100L))
    assert(!Dedup.massRoute("spec", 100L, 100L))
    assert(!Dedup.massRoute("spec", 0L, 100L))
  }

  test("massParts scales with mass inside [32, 4096]") {
    assert(Dedup.massParts(1000L) == 32)
    assert(Dedup.massParts(490000000L) == 245)
    assert(Dedup.massParts(Long.MaxValue / 4) == 4096)
  }

  test("tripped probe takes the bounded route with IDENTICAL candidate " +
      "pairs (d04 shape)") {
    val sigs = degenerateSigs(50)
    // mass = 4 bands × 50·49 = 9800 > budget 1000; floor 10 < 50 docs
    val default = Dedup.lshCandidates(sigs, bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    withProps("graft.dedup.massProbeMinDocs" -> "10",
        "graft.dedup.massBudgetPairs" -> "1000") {
      val bounded = Dedup.lshCandidates(sigs, bands = 4, rowsPerBand = 2)
      assert(bounded.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("repartitionbyexpression"),
        "probe must have injected the output-sized exchange")
      assert(bounded.as[(Long, Long)].collect().toSet == default,
        "bounded route changed the candidate set")
    }
    assert(default.size == 50 * 49 / 2, "fixture must be all-pairs degenerate")
  }

  test("below the floor the plan carries no injected exchange") {
    val sigs = degenerateSigs(20)
    val plan = Dedup.lshCandidates(sigs, bands = 4, rowsPerBand = 2)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("repartitionbyexpression"),
      "default-scale plan must stay byte-identical to the probe-less shape")
  }

  test("massReroute=off turns a tripped probe into a loud failure " +
      "carrying the evidence") {
    withProps(Dedup.MassRerouteProp -> "off") {
      val e = intercept[IllegalStateException] {
        Dedup.massRoute("lshCandidates", 9800L, 1000L)
      }
      assert(e.getMessage.contains("9800") && e.getMessage.contains("1000"),
        s"probe evidence missing from: ${e.getMessage}")
    }
  }

  test("tripped probe keeps d05's simhash pairs identical and injects " +
      "the exchange; below the floor the plan is probe-less") {
    // identical token lists -> identical 64-bit signatures -> every doc
    // shares all four 16-bit chunks (the replica-degenerate shape; no
    // maxBucket cap exists on this path, so the probe is the only guard)
    val toks = (0L until 30L).map(i => (i, Seq("alpha", "beta", "gamma")))
      .toDF("id", "tokens")
    val default = Dedup.simhashNearDuplicates(toks)
      .as[(Long, Long, Int)].collect().toSet
    assert(default.size == 30 * 29 / 2 &&
      default.forall(_._3 == 0), "fixture must be all-pairs at Hamming 0")
    withProps("graft.dedup.massProbeMinDocs" -> "10",
        "graft.dedup.massBudgetPairs" -> "100") {
      val bounded = Dedup.simhashNearDuplicates(toks)
      assert(bounded.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("repartitionbyexpression"),
        "probe must have injected the output-sized exchange")
      assert(bounded.as[(Long, Long, Int)].collect().toSet == default,
        "bounded route changed the simhash pair set")
    }
    val below = Dedup.simhashNearDuplicates(toks)
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!below.contains("repartitionbyexpression"),
      "default-scale plan must stay byte-identical to the probe-less shape")
  }

  test("tripped probe keeps d15's quantized cosine pairs bit-identical") {
    // same-token documents (quadratic token join) plus two distinct
    // docs so the df cap keeps a nonzero vocabulary
    val docs = ((0 until 12).map(i => (i.toLong, "alpha beta gamma delta")) ++
      Seq((100L, "alpha epsilon zeta eta"), (200L, "beta theta iota kappa")))
      .toDF("doc_id", "text")
    def run(): Set[(Long, Long, Double)] =
      Similarity.tfidfCosinePairs(docs, "doc_id",
          graft.text.TextFunctions.tokenize(org.apache.spark.sql.functions.col("text")),
          quantScale = 1e4, maxDfFrac = 0.95, tau = 0.1)
        .as[(Long, Long, Double)].collect().toSet
    val default = run()
    withProps("graft.dedup.massProbeMinDocs" -> "5",
        "graft.dedup.massBudgetPairs" -> "10") {
      assert(run() == default, "bounded route changed d15 values")
    }
    assert(default.nonEmpty, "fixture must produce pairs")
  }
}
