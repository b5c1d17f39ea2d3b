package graft.misc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan contracts for the round-4 operators: the scale story
  * is a property of the PLAN (how many shuffles, which partitioning),
  * not of the output — pin it so a refactor that silently adds an
  * exchange fails here, not in a 100 TB run.
  *
  * Counted against the pre-AQE executed plan string; the final gate
  * ORDER BY contributes the single rangepartitioning exchange, which
  * is excluded (it's the determinism requirement, not the operator).
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = graft.SparkEntry.queries(name)
    q(spark, sf("sf0.001")).queryExecution.executedPlan.toString
  }

  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  test("q31 sliding-frame family shares ONE user-partitioned shuffle") {
    val plan = planOf("q31_moving_window")
    assert(hashExchanges(plan) == 1,
      s"expected exactly 1 hash exchange (all frames off one sort), got:\n$plan")
  }

  test("c06 context packing is one shard-partitioned shuffle") {
    val plan = planOf("c06_context_packing")
    assert(hashExchanges(plan) == 1,
      s"expected exactly 1 hash exchange (per-shard windows only), got:\n$plan")
  }

  test("q30 cube is a single Expand + aggregate pass") {
    val plan = planOf("q30_cube")
    assert("Expand".r.findAllIn(plan).length == 1,
      s"expected one Expand (no per-level re-scan), got:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"cube must not re-read the fact table per level, got:\n$plan")
  }

  test("s05 quantization is a narrow map: no shuffle before the sort") {
    val plan = planOf("s05_quantize_int8")
    assert(hashExchanges(plan) == 0,
      s"expected no hash exchange (row-local expressions only), got:\n$plan")
  }

  test("q33 bloom prefilter evaluates at the fact scan, not after the join") {
    val plan = planOf("q33_bloom_join")
    // the probe must sit in a Filter directly over the lineitem scan —
    // the runtime-row-filter shape — not above the BroadcastHashJoin
    val idxJoin = plan.indexOf("BroadcastHashJoin")
    val idxProbe = plan.indexOf("fnv1aperm")
    assert(idxJoin >= 0 && idxProbe > idxJoin,
      s"bloom probe should appear below (after) the join node in the tree, got:\n$plan")
    assert(hashExchanges(plan) <= 1,
      s"fact side must not shuffle into the join (broadcast dim), got:\n$plan")
  }

  test("a09 chunking is a narrow generate: no shuffle before the sort") {
    val plan = planOf("a09_chunks")
    assert(hashExchanges(plan) == 0,
      s"expected no hash exchange (row-local 1-to-many Generate), got:\n$plan")
  }

  test("q50 EMA is windows + one hash agg — no per-user array collect") {
    val plan = planOf("q50_ema")
    assert(!plan.contains("collect_list"),
      s"q50 must not gather per-user histories into one row, got:\n$plan")
    // row_number/count windows and the aggregation all share the one
    // user-hash exchange
    assert(hashExchanges(plan) == 1,
      s"expected exactly 1 hash exchange (windows + agg co-partitioned), got:\n$plan")
  }

  test("q51 runs the native session-window aggregation") {
    val plan = planOf("q51_session_window")
    assert(plan.contains("session_window") || plan.contains("SessionWindow"),
      s"expected the native merging-interval session node, got:\n$plan")
    assert(!plan.contains("FlatMapGroups"),
      s"q51 is the engine-managed form, not the custom-state one:\n$plan")
  }

  test("q34 profiler is one scan with a single Expand for multi-distinct") {
    val plan = planOf("q34_profile")
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"profiler must read the table once, got:\n$plan")
    assert("Expand".r.findAllIn(plan).length == 1,
      s"expected one Expand (multi-DISTINCT in one pass), got:\n$plan")
  }

  test("c07 stratified sample pushes the rank filter below the shuffle") {
    val plan = planOf("c07_stratified_sample")
    // partial WindowGroupLimit before the lang exchange caps each map
    // task at k rows per stratum — the property that keeps the window
    // input bounded at corpus scale
    assert("WindowGroupLimit".r.findAllIn(plan).length == 2,
      s"expected partial+final WindowGroupLimit, got:\n$plan")
    assert(hashExchanges(plan) == 1,
      s"expected one lang-partitioned exchange, got:\n$plan")
  }

  test("c12 weighted sample pushes the rank filter below the shuffle") {
    val plan = planOf("c12_weighted_sample")
    // same WindowGroupLimit shape as c07: each map task forwards at
    // most k candidate rows per stratum into the source exchange
    assert("WindowGroupLimit".r.findAllIn(plan).length == 2,
      s"expected partial+final WindowGroupLimit, got:\n$plan")
  }

  test("q37 z-order key is computed without any extra exchange") {
    val plan = planOf("q37_zorder_cluster")
    // narrow map for the interleave + one tile-keyed aggregate exchange
    assert(hashExchanges(plan) == 1,
      s"expected only the groupBy(tile) exchange, got:\n$plan")
  }

  test("io09's fact scan is pruned by a dynamicpruning subquery") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("dpp_spec").toString
    graft.tables.Tables.orders(spark, sf("sf0.001"))
      .write.mode("overwrite").partitionBy("o_orderpriority")
      .parquet(s"$stage/fact")
    graft.tables.Tables.orders(spark, sf("sf0.001"))
      .select($"o_orderpriority").distinct()
      .withColumn("tag", substring($"o_orderpriority", 1, 1))
      .write.mode("overwrite").parquet(s"$stage/dim")
    val fact = spark.read.parquet(s"$stage/fact")
    // filter on the NON-key column: a join-key filter would be
    // statically propagated instead of dynamically pruned
    val dim = spark.read.parquet(s"$stage/dim").filter($"tag" === "1")
    val plan = fact.join(dim, "o_orderpriority")
      .groupBy().count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition filter, got:\n$plan")
  }

  test("e02 standardize is stats-broadcast + narrow transform") {
    val q = graft.SparkEntry.queries("e02_standardize")
    val plan = q(spark, sf("sf0.001")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"stat row must broadcast, got:\n$plan")
    // the only hash exchange is the 64-group dim-stats aggregation
    assert(hashExchanges(plan) == 1,
      s"expected one dim-stats exchange, got:\n$plan")
  }

  test("d16 repeated-spans never goes pairwise: no joins except equi") {
    val plan = planOf("d16_repeated_spans")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram counting must stay linear (hash agg + equi-join), got:\n$plan")
    assert(plan.contains("Generate explode"),
      s"gram fan-out must be a row-local Generate, got:\n$plan")
  }

  test("s08 PQ-ADC scans codes with broadcast LUTs only") {
    val plan = planOf("s08_pq_adc")
    // every LUT reaches the code table via broadcast — the code scan
    // itself must never hash-shuffle against the queries
    assert(plan.contains("BroadcastHashJoin"),
      s"LUT joins must broadcast, got:\n$plan")
  }

  test("c17 interleave pushes the per-source rank as WindowGroupLimit") {
    val plan = planOf("c17_interleave")
    assert(plan.contains("WindowGroupLimit"),
      s"rn <= 10 must push into the shuffle (map tasks forward <= 10/source), got:\n$plan")
  }

  test("t16 BPE encode aggregates types, never re-scanning the corpus") {
    val q = graft.SparkEntry.queries("t16_bpe_encode")
    val plan = q(spark, sf("sf0.001")).queryExecution.executedPlan.toString
    // after training, encode works off the checkpointed TYPE table: the
    // plan must not contain a parquet scan of documents
    assert(!plan.contains("Scan parquet"),
      s"encode must reuse the word-type table, got:\n$plan")
  }

  test("a26 DSIR scoring broadcasts the vocabulary-sized LM table") {
    val plan = planOf("a26_dsir_weights")
    // the per-token scoring join (corpus-sized probe side) must be
    // broadcast, not an all-corpus shuffle on the word key
    assert(plan.contains("BroadcastHashJoin"),
      s"LM table must broadcast into the scoring join, got:\n$plan")
  }

  test("c21 token chunking is a narrow generate: no shuffle before the sort") {
    val plan = planOf("c21_chunk_windows")
    assert(hashExchanges(plan) == 0,
      s"expected no hash exchange (row-local 1-to-many Generate), got:\n$plan")
  }

  test("a25 gopher gates are row-local: no shuffle before the sort") {
    val plan = planOf("a25_gopher_gates")
    assert(hashExchanges(plan) == 0,
      s"expected no hash exchange (pure narrow expressions), got:\n$plan")
  }

  test("d19 dup-gram rate reads the persisted occurrence table on both references") {
    val plan = planOf("d19_dupgram_rate")
    // the (doc, gram, cnt) table feeds the df aggregation AND the rate
    // join probe; BOTH references must hit the InMemoryRelation (the
    // "Scan parquet" strings inside the printed cached-plan subtree are
    // the one-time cache build, not live scans)
    assert("InMemoryTableScan".r.findAllIn(plan).length == 2,
      s"both diamond references must read the persisted table, got:\n$plan")
    // the aggregated gram-df side must broadcast into the rate join —
    // never shuffle the occurrence table a second time for it
    assert(plan.contains("BroadcastHashJoin"),
      s"gram-df side should broadcast into the rate join, got:\n$plan")
  }

  test("s12 ann recall broadcasts the bounded query set in both legs") {
    val plan = planOf("s12_ann_recall")
    // exact leg: broadcast NLJ of the 20-query side against the full
    // vector table (linear scan, no pairwise shuffle)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"exact leg must broadcast the bounded query set, got:\n$plan")
    // LSH leg: the band-bucket join builds on the banded query side —
    // broadcast, so the corpus side never shuffles for candidates
    assert(plan.contains("BroadcastHashJoin"),
      s"LSH bucket join must broadcast the banded query side, got:\n$plan")
  }
}
