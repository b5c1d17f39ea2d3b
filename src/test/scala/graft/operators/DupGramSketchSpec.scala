package graft.operators

import graft.SparkSpec

/** Dedup.dupGramRateSketch — the CMS-probed d19 scale route. Pins the
  * properties the operator doc promises:
  *  1. The estimate errs UPWARD ONLY at any width: row-for-row
  *     dup_occ_est >= dup_occ (a CMS never undercounts) — the bounded
  *     false-positive overhang.
  *  2. The overhang shrinks as width grows (the planner's tuning knob).
  *  3. When the corpus's distinct-gram cardinality is far below width,
  *     the sketch route is bit-identical to the exact df join.
  * All hashes are FNV (deterministic), so none of this is flaky.
  */
class DupGramSketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def byDoc(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map { r =>
      r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("dup_occ"))
    }.toMap

  test("estimate is one-sided (never undercounts) and width shrinks the overhang") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val exact = byDoc(Dedup.dupGramRate(docs, "doc_id", "text", 5))
    def overhang(width: Int, depth: Int): Long = {
      val est = byDoc(Dedup.dupGramRateSketch(docs, "doc_id", "text", 5,
        depth = depth, width = width))
      assert(est.keySet == exact.keySet)
      exact.map { case (id, (ng, dup)) =>
        val (ngE, dupE) = est(id)
        assert(ngE == ng, s"doc $id: n_grams must be sketch-independent")
        assert(dupE >= dup, s"doc $id: CMS estimate $dupE undercut exact $dup")
        dupE - dup
      }.sum
    }
    val narrow = overhang(width = 64, depth = 2)
    val wide = overhang(width = 65536, depth = 4)
    assert(narrow > 0,
      "64-bucket CMS produced zero overcounts — the one-sided check bit on nothing")
    assert(wide < narrow,
      s"overhang must shrink with width (64 -> $narrow, 65536 -> $wide)")
    // at 4x65536 vs sf0.001's gram cardinality the residual overhang is
    // a sub-percent bias on the corpus-total duplicated-occurrence mass
    val totalGrams = exact.values.map(_._1).sum
    assert(wide.toDouble / totalGrams < 0.02,
      s"wide-sketch overhang $wide too large vs $totalGrams total grams")
  }

  test("Bloom route is one-sided, and exact when the filter fits the dup-gram set") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val exact = byDoc(Dedup.dupGramRate(docs, "doc_id", "text", 5))
    // production sizing: 2^22 bits vs sf0.001's duplicated-gram count —
    // k-position full collisions effectively impossible → bit-identical
    val wide = byDoc(Dedup.dupGramRateBloom(docs, "doc_id", "text", 5,
      k = 6, mBits = 1 << 22))
    assert(wide == exact, "well-sized Bloom route must match the exact join")
    // starved filter: 2^10 bits → false positives guaranteed, but NEVER
    // false negatives — the estimate may only move UP
    val tiny = byDoc(Dedup.dupGramRateBloom(docs, "doc_id", "text", 5,
      k = 2, mBits = 1 << 10))
    assert(tiny.keySet == exact.keySet)
    exact.foreach { case (id, (ng, dup)) =>
      val (ngE, dupE) = tiny(id)
      assert(ngE == ng)
      assert(dupE >= dup, s"doc $id: Bloom estimate $dupE undercut exact $dup")
    }
    assert(exact.exists { case (id, (_, dup)) => tiny(id)._2 > dup },
      "starved Bloom produced zero overcounts — the one-sided check bit on nothing")
  }

  test("sketch is bit-identical to exact when width >> distinct grams") {
    import spark.implicits._
    // ~40 distinct grams vs 8192 buckets: no gram's depth counters can
    // plausibly all collide; planted cross-doc duplicates must be found
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over a sleeping cat instead"),
      (2L, "completely different words populate this third document body"),
      (3L, "another entirely unrelated sentence with unique vocabulary choices"),
      (4L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val exact = byDoc(Dedup.dupGramRate(docs, "doc_id", "text", 5))
    val est = byDoc(Dedup.dupGramRateSketch(docs, "doc_id", "text", 5,
      depth = 4, width = 8192))
    assert(est == exact, "wide-CMS route must match the exact df join")
    // sanity: the planted duplicates actually registered as duplicates
    assert(exact(0L)._2 > 0 && exact(4L)._2 > 0)
  }
}
