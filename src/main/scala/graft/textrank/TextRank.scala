package graft.textrank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** TextRank (Mihalcea & Tarau 2004) re-expressed as declarative DataFrame
  * plans — SURVEY.md §2.9 (G1-G7) / EP2.
  *
  * Reference semantics reproduced exactly (BigdataProjectCode.py):
  *  - similarity `|set-intersect| / (log2(|a|) + log2(|b|) + 1)` where the
  *    lengths count duplicates but the intersection is set-based (:339-347,
  *    quirk in SURVEY G2);
  *  - self/zero-similarity edges dropped (:342-347, F8);
  *  - rank init 0.15 (not 1/N), damping 0.85, fixed 5 iterations, update
  *    `r' = 0.15 + 0.85 * Σ_in rank_src * w / Σ_out w_src` (:386-391, Q4);
  *  - vertices with an empty token list are excluded (log2(0) is undefined
  *    — the reference would crash on them; F7).
  *
  * Scale design: the all-pairs similarity join (J2) is the quadratic
  * step. The exact path is a broadcast-nested-loop self-join, correct and
  * fast while the vertex set (sentence band survivors) fits a broadcast;
  * the 100 TB path ([[EdgeCandidates.Lsh]]) routes edge generation through
  * the MinHash-LSH banding in `graft.operators.Dedup` — candidates from
  * bucket joins (linear + bounded-bucket quadratic), exact re-weighting
  * only on candidate pairs — producing the same edge schema so the rank
  * loop (two shuffles per iteration, lineage cut by localCheckpoint) is
  * unchanged.
  */
object TextRank {

  /** How the all-pairs similarity edge list is generated. */
  sealed trait EdgeCandidates
  object EdgeCandidates {
    /** Exact all-pairs self-join (src<dst halving + mirror). O(V²)
      * comparisons — the correctness oracle path, right up to the point
      * where the vertex set outgrows a broadcast.
      */
    case object Exact extends EdgeCandidates

    /** MinHash-LSH candidate prefilter: signature over the distinct
      * token set, band/bucket join for candidates, exact TextRank
      * re-weighting ONLY on candidate pairs. Linear in V plus the
      * bounded within-bucket joins — the 100 TB shape.
      *
      * Recall caveat: a pair whose token-set Jaccard is low (but whose
      * intersection is nonzero) may never collide in any band; its edge
      * is dropped, perturbing ranks slightly. With rowsPerBand=2 and
      * bands=64 a pair at Jaccard 0.2 is caught with p≈0.93, at 0.5
      * with p≈1-2e-8. `TextRankLshSpec` bounds the rank divergence on
      * the fixture corpus.
      *
      * @param minVertices below this vertex count the exact path is used
      *        instead — one config serves the gate scale (exact, oracle-
      *        matching) and the corpus scale (LSH) without re-plumbing.
      */
    final case class Lsh(
        numHashes: Int = 128,
        bands: Int = 64,
        maxBucket: Int = 10000,
        minVertices: Long = 0L) extends EdgeCandidates
  }

  final case class Config(
      iterations: Int = 5,
      damping: Double = 0.85,
      initRank: Double = 0.15,
      minWords: Int = 10,
      maxWords: Int = 30,
      lemma: Boolean = true,
      /** Vertex count above which the iteration's rank side falls back
        * from a broadcast join to a shuffled join (see
        * [[broadcastRankLimit]]). Overridable per call, mainly so tests
        * can exercise the shuffled path on small fixtures.
        */
      broadcastLimit: Long = broadcastRankLimit,
      /** Edge count above which the iteration falls back from the
        * compacted-primitive-arrays treeAggregate strategy to the
        * shuffled join: the compact arrays are EDGE-sized (16 bytes per
        * directed edge held across the executor heap), so vertex count
        * alone is the wrong budget — the sf3 stress replica's exact
        * graph (~1 B directed edges, 45 k vertices) passed the vertex
        * probe and then blew the 8 g heap building the arrays. 150 M
        * edges ≈ 2.4 GB of arrays; the sf1 graph (113 M) stays on the
        * fast path.
        */
      edgeBudget: Long = 150000000L,
      /** Storage level for the edge-sized caches (the edge list and the
        * normalized-weight table). MEMORY_AND_DISK by default;
        * [[rankDocuments]] switches to DISK_ONLY when the quadratic
        * estimate says the cache dwarfs the heap — at the sf3 replica a
        * ~24 GB columnar edge cache on an 8 g heap made every
        * concurrent reader/builder marginal (boxed dictionary decoders
        * OOM'd mid-read), while DISK_ONLY leaves the whole heap to
        * execution memory and streams blocks from local disk.
        */
      edgeStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      /** Edge-generation strategy; Exact below, LSH at corpus scale. */
      edgeCandidates: EdgeCandidates = EdgeCandidates.Exact)

  /** Estimated edge-cache bytes above which [[rankDocuments]] flips the
    * edge caches to DISK_ONLY (2 GB ≈ a quarter of the default 8 g
    * heap; the sf1 graph's 2.7 GB crosses it, the sf0.1 bench graph's
    * ~54 MB does not).
    */
  val DiskEdgeBytes: Long = 2L << 30

  /** a·b saturating at Long.MaxValue (inputs are non-negative counts).
    * The quadratic probes (`nv² · bytes-per-edge`) overflow a plain Long
    * multiply at nv ≳ 4.4e8 vertices and wrap NEGATIVE — silently
    * disengaging the DISK_ONLY flip and output-sized partitioning at
    * exactly the corpus scales they protect. Saturation keeps the
    * comparisons monotone at any vertex count.
    */
  def satMul(a: Long, b: Long): Long =
    if (a == 0L || b == 0L) 0L
    else if (a > Long.MaxValue / b) Long.MaxValue
    else a * b

  /** Overflow-safe estimate of the exact route's edge-cache bytes:
    * every vertex pair, both directions, 24 B each (`nv² · 48`,
    * saturating). Shared by [[rankDocuments]] and the tr04 GraphX query
    * so the two DISK_ONLY probes cannot drift.
    */
  def quadEdgeBytes(nv: Long): Long = satMul(satMul(nv, nv), 48L)

  /** Ordered-vertex-pair count above which [[lshSimilarityEdges]]'
    * degeneracy probe may fall back to the exact route. Sits in the
    * dead band between the largest ORACLE-GATED graph (sf1: 10,660
    * band-filtered vertices → 113.6 M ordered pairs — the engine must
    * stay on the oracle-replayed LSH route there, whatever the probe
    * reads) and the sf3 stress replica (31,980 vertices → 1.02 B pairs
    * — where a diversity-less corpus collapses the bucket joins toward
    * all-pairs and OOMs the 8 g heap). Below it the probe is skipped
    * entirely: gate-scale tr06 plans and values are byte-identical to
    * the probe-less round-11 code.
    */
  val LshFallbackMinPairs: Long = 300000000L

  /** System property gating the degenerate-corpus fallback in
    * [[lshSimilarityEdges]] (r12 ADVICE: the reroute changes the answer
    * class, so runs whose values are externally checked must not take
    * it silently):
    *
    *  - `"auto"` (default, absent) — when the diversity probe reads
    *    degenerate, reroute to the exact superset graph, announcing it
    *    on stderr (the engine/stress posture: complete rather than OOM);
    *  - `"off"` — fail loudly (`IllegalStateException` carrying the
    *    probe readings) instead of rerouting. [[graft.Verify]] sets
    *    this: an oracle-gated corpus that ever grows past the probe
    *    floor AND reads degenerate must surface as a gate ERROR to be
    *    re-adjudicated, never as a silent route (and hash) drift.
    *
    * The probe itself always runs above [[LshFallbackMinPairs]] — the
    * property only selects what happens when it trips.
    */
  val LshFallbackProp: String = "graft.textrank.lshFallback"

  /** Enforces [[LshFallbackProp]] at the moment the probe trips: no-op
    * in `"auto"` mode (caller proceeds to reroute), throws in `"off"`
    * mode with the probe evidence in the message. Factored out so the
    * policy is unit-testable below the 300 M-pair probe floor.
    */
  private[textrank] def enforceFallbackPolicy(
      nv: Long, mass: Long, allPairs: Long): Unit = {
    val mode = sys.props.getOrElse(LshFallbackProp, "auto")
    if (mode == "off")
      throw new IllegalStateException(
        s"TextRank LSH diversity probe read DEGENERATE (nv=$nv, " +
          s"bucket-join mass=$mass >= all-pairs bound $allPairs) and " +
          s"-D$LshFallbackProp=off forbids the exact-route fallback: " +
          "this corpus's LSH plan is not sub-quadratic, and the " +
          "fallback would widen the edge set (answer-class change). " +
          "Re-adjudicate the route for this corpus explicitly.")
  }

  /** Directed edge list (src, dst, weight) over all ordered pairs with
    * nonzero similarity (both directions present — the graph is
    * symmetric, matching the reference's adjacency map).
    *
    * vertices: (id: long, tokens: array<string>), tokens non-empty.
    *
    * @param vertexCount the caller's precomputed `vertices.count()`
    *        (used to size the stream side for the quadratic output);
    *        pass -1 to let this method count — in that case an
    *        unpersisted input is persisted first, so an external caller
    *        does not recompute its full token pipeline once for the
    *        count and again for the join.
    */
  def similarityEdges(vertices: DataFrame, vertexCount: Long = -1L): DataFrame = {
    // Distinct token sets and raw lengths are per-VERTEX quantities:
    // compute them once before the quadratic join, not per pair (a
    // V²→V reduction in array_distinct work).
    val v = vertices.select(col("id"),
      array_distinct(col("tokens")).as("dt"),
      size(col("tokens")).as("n"))
    // Size the STREAM side for the quadratic OUTPUT, not the input: the
    // self-join multiplies row count by ~V/2, so cores-sized input
    // partitions become multi-hundred-MB edge partitions whose cache
    // blocks downstream readers must hold whole — at the sf3 replica
    // (45 k vertices -> ~2 B directed edges) 32 concurrent fat-block
    // reads starved every keyed aggregation in the session
    // (AGGREGATE_OUT_OF_MEMORY). Hash-partitioning by src keeps each
    // vertex's out-edges together (map-side combine for the out-weight
    // sums) and bounds a partition to ~64 MB of edges.
    val nv =
      if (vertexCount >= 0L) vertexCount
      else {
        // persist-if-unpersisted (same pattern as lshSimilarityEdges'
        // v cache: no unpersist hook — the returned plan still reads
        // it; MEMORY_AND_DISK entries are LRU-evicted)
        if (vertices.storageLevel ==
            org.apache.spark.storage.StorageLevel.NONE) vertices.persist()
        vertices.count()
      }
    val cores = vertices.sparkSession.sparkContext.defaultParallelism
    // satMul: a plain nv²·48 wraps negative at nv ≳ 4.4e8 and would
    // collapse targetParts back to `cores` at exactly the scales the
    // output-sized partitioning protects
    val targetParts = math.min(4096L,
      math.max(cores.toLong, satMul(satMul(nv, nv), 48L) / (64L << 20))).toInt
    val a = v.repartition(targetParts, col("id"))
      .select(col("id").as("src"), col("dt").as("dt_a"), col("n").as("na"))
    val b = v.select(col("id").as("dst"), col("dt").as("dt_b"), col("n").as("nb"))
    // The graph is symmetric: compute each unordered pair's intersection
    // once (src < dst) and mirror the edge — halves the quadratic work.
    a.join(broadcast(b), col("src") < col("dst"))
      .withColumn("weight",
        graft.functions.IntersectSize.intersect_size(col("dt_a"), col("dt_b")).cast("double") /
          (log2(col("na")) + log2(col("nb")) + lit(1.0)))
      .filter(col("weight") =!= 0.0)
      // mirror in the same pass (a union would re-run the join subtree)
      .select(explode(array(
        struct(col("src"), col("dst"), col("weight")),
        struct(col("dst").as("src"), col("src").as("dst"), col("weight")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.weight").as("weight"))
  }

  /** LSH-prefiltered edge list — same schema and weight semantics as
    * [[similarityEdges]], but candidate pairs come from MinHash banding
    * over the distinct token sets instead of the quadratic self-join.
    * Exact TextRank weights are recomputed on the candidates, so every
    * SURVIVING edge is bit-identical to the exact path's; only edges the
    * banding misses (low-Jaccard pairs) can differ.
    *
    * ==Degenerate-corpus fallback contract==
    *
    * Above [[LshFallbackMinPairs]] ordered pairs, a diversity probe
    * (below) may route this call to [[similarityEdges]] — and that
    * CHANGES THE ANSWER CLASS, deliberately: the exact route emits
    * every nonzero-weight pair, a SUPERSET of the band-colliding pairs
    * this route emits (`TextRankSpec` pins the direction: LSH edges ⊆
    * exact edges, surviving weights bit-identical). On a corpus where
    * the probe trips, banding is not pruning, so the superset is both
    * cheaper to compute and closer to the exact TextRank semantics —
    * but a caller treating "tr06 = LSH-approximate ranks" as a fixed
    * contract must know the swap happened: the runtime marker is the
    * `[textrank] LSH diversity probe: ... DEGENERATE, exact-route
    * fallback` stderr line. Callers whose values are externally
    * checked can forbid the reroute outright with
    * `-D{{{graft.textrank.lshFallback}}}=off` ([[LshFallbackProp]]) —
    * the probe tripping then throws instead. No oracle-gated scale
    * reaches the probe floor (sf1 tops out at 113.6 M pairs), so the
    * gate plan is unaffected either way.
    */
  def lshSimilarityEdges(vertices: DataFrame,
      lsh: EdgeCandidates.Lsh, vertexCount: Long = -1L): DataFrame = {
    import graft.operators.Dedup
    val rowsPerBand = math.max(1, lsh.numHashes / lsh.bands)
    // Distinct token sets / raw lengths are per-vertex quantities; this
    // table feeds the signature build and both candidate re-join sides.
    // (Persisted without an unpersist hook — the result is a lazy plan
    // that still references it; MEMORY_AND_DISK entries are LRU-evicted,
    // same documented pattern as Dedup.minhashNearDuplicates.)
    val v = vertices.select(col("id"),
      array_distinct(col("tokens")).as("dt"),
      size(col("tokens")).as("n"))
      .persist()
    val nv = if (vertexCount >= 0L) vertexCount else v.count()
    val sigs = v
      .withColumn("hv", Dedup.shingleHashes(col("dt")))
      .withColumn("sig", Dedup.minhashSignature(col("hv"), lsh.bands * rowsPerBand))
      .select("id", "sig")
    // DEGENERATE-CORPUS GUARD. LSH banding is sub-quadratic only while
    // documents' signatures differ; on a diversity-less corpus (the sf3
    // stress replica's ~31-token shared vocabulary) nearly every
    // document collides into shared buckets, the candidate set
    // collapses toward all-pairs (~1 B), and the bucket joins OOM the
    // heap — LSH cannot be sub-quadratic there BY CONSTRUCTION. Probe
    // the post-cap bucket pair mass (one vertex-sized aggregation) and,
    // when the banding provably isn't pruning, run the exact route
    // instead: it carries output-sized partitioning + DISK_ONLY caches
    // and survived the same replica's 1.02 B-edge graph inside 8 g.
    // The probe only runs above [[LshFallbackMinPairs]], a scale no
    // oracle-gated graph reaches — at/below sf1 the plan and values
    // are identical to the probe-less path (tr06's oracle replays the
    // LSH banding, so the engine must stay on it wherever hashes are
    // checked).
    val allPairs = satMul(nv, nv)
    // When the probe runs, the signature stage (the compute-bound step
    // — see Dedup.minhashSignature) is about to be evaluated once for
    // the probe aggregation and, on the non-degenerate path, again
    // inside lshCandidates: persist it so the 100 TB shape pays the
    // signature pass exactly once (same no-unpersist-hook pattern as
    // `v` above; released explicitly on the fallback path, where
    // nothing downstream reads it). Below the probe floor nothing
    // changes — gate-scale plans stay byte-identical.
    val probed = allPairs > LshFallbackMinPairs
    if (probed) sigs.persist(): Unit
    val (degenerate, probeMass) = if (!probed) (false, 0L) else {
      // Per-(band, bucket) member counts c, capped like lshCandidates;
      // Σ c·(c−1) over surviving buckets is the bucket joins' exact
      // directed PRE-DISTINCT output — the LSH route's true cost. A
      // first cut compared the /bands-normalized (deduped) candidate
      // estimate to all-pairs and read "banding prunes" on the sf3
      // replica (111 M deduped vs 1.02 B pairs) while the raw mass was
      // 7.1 B rows — the distinct over THAT stream is what OOM'd the
      // 8 g heap. So compare costs directly: when the bucket joins
      // would emit at least as many rows as the exact all-pairs join,
      // LSH is strictly more work than exact for (at best) the same
      // edges — fall back. On a diverse corpus a pair collides in ~1
      // band and mass ≪ allPairs, so the 100 TB shape stays on LSH.
      // collect-bound: scalar: single aggregated row (bucket-mass probe)
      val mass = sigs
        .select(posexplode(Dedup.bandKeyArray(col("sig"), lsh.bands, rowsPerBand)))
        .toDF("band", "key")
        .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
        .filter(col("c") <= lsh.maxBucket)
        .agg(coalesce(sum(col("c") * (col("c") - lit(1L))), lit(0L)))
        .first().getLong(0)
      val hit = mass >= allPairs
      System.err.println(s"[textrank] LSH diversity probe: nv=$nv, " +
        s"bucket-join mass=$mass (all-pairs bound $allPairs) -> " +
        (if (hit) "DEGENERATE, exact-route fallback" else "banding prunes, LSH route"))
      (hit, mass)
    }
    if (degenerate) {
      // release BOTH probe caches before the policy gate: neither the
      // exact route nor the off-mode throw path reads them, and a
      // caller that catches the throw (Verify's per-query catch keeps
      // the session alive) must not inherit two corpus-scale caches
      // competing for its heap
      sigs.unpersist() // the exact route reads neither cache
      v.unpersist()    // it re-derives its own per-vertex table
      // throws here when -Dgraft.textrank.lshFallback=off (Verify sets
      // it: an oracle-gated run must never silently change answer class)
      enforceFallbackPolicy(nv, probeMass, allPairs)
      return similarityEdges(vertices, nv)
    }
    val cands = Dedup.lshCandidates(sigs, lsh.bands, rowsPerBand, lsh.maxBucket)
    val a = v.select(col("id").as("src"), col("dt").as("dt_a"), col("n").as("na"))
    val b = v.select(col("id").as("dst"), col("dt").as("dt_b"), col("n").as("nb"))
    cands.select(col("a").as("src"), col("b").as("dst"))
      .join(a, "src").join(b, "dst")
      .withColumn("weight",
        graft.functions.IntersectSize.intersect_size(col("dt_a"), col("dt_b")).cast("double") /
          (log2(col("na")) + log2(col("nb")) + lit(1.0)))
      .filter(col("weight") =!= 0.0)
      .select(explode(array(
        struct(col("src"), col("dst"), col("weight")),
        struct(col("dst").as("src"), col("src").as("dst"), col("weight")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.weight").as("weight"))
  }

  /** Routes edge generation per [[Config.edgeCandidates]]: exact all-pairs,
    * or LSH candidates above `minVertices` (vertices should be persisted
    * by the caller — the routing count and the downstream plan both read
    * it). `vertexCount`, when ≥ 0, is the caller's precomputed
    * `vertices.count()` — [[rankDocuments]] already holds it for the
    * DISK_ONLY probe, so no route re-counts.
    */
  def edges(vertices: DataFrame, cfg: Config, vertexCount: Long = -1L): DataFrame =
    cfg.edgeCandidates match {
      case EdgeCandidates.Exact => similarityEdges(vertices, vertexCount)
      case l: EdgeCandidates.Lsh =>
        val nv = if (vertexCount >= 0L) vertexCount else vertices.count()
        if (l.minVertices > 0L && nv < l.minVertices)
          similarityEdges(vertices, nv)
        else lshSimilarityEdges(vertices, l, nv)
    }

  /** Vertex count below which the rank vector is held as driver-side
    * state per iteration (the [[ranksAggregated]] path). The budget is
    * the same one an explicit `broadcast(r)` hint would spend — the
    * vector must fit on the driver to build the broadcast either way —
    * so 500k vertices ≈ 4 MB of doubles (vs 30-50 MB as a broadcast
    * hash relation). Beyond it the iteration falls back to a shuffled
    * join over distributed rank state ([[ranksShuffled]]).
    */
  val broadcastRankLimit: Long = 500000L

  /** Iterative rank propagation (G4-G6). Returns (id, rnk).
    *
    * Two execution strategies, routed on vertex count (the rank vector
    * is vertex-sized) AND edge count (the compact arrays are edge-sized
    * — [[Config.edgeBudget]]):
    *
    *  - **≤ [[Config.broadcastLimit]]**: the MLlib small-model pattern
    *    (how gradient descent iterates): the edge list is compacted once
    *    into cached primitive arrays, and each iteration is ONE
    *    `treeAggregate` job — broadcast the rank array, fused
    *    multiply-add into a per-partition accumulator, tree-combine.
    *    No join to plan, no broadcast hash relation to build, no
    *    checkpoint: per-iteration cost is the raw edge scan. This is
    *    exactly the state a broadcast-join iteration would hold on the
    *    driver anyway — same memory budget, ~6× less per-round overhead.
    *  - **above the limit**: rank state stays distributed; each
    *    iteration is a shuffled join + hash-agg with a `localCheckpoint`
    *    lineage cut (H5). This is the arbitrarily-large-V shape.
    */
  def ranks(edges: DataFrame, cfg: Config = Config(),
      maxDirectedEdges: Long = Long.MaxValue,
      symmetricEdges: Boolean = false,
      maxVertices: Long = Long.MaxValue): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight"))
      .persist(cfg.edgeStorage)
    // Materialize the edge cache under a STATELESS scan first: at the
    // sf3 replica, building the 1 B-edge cache underneath a hash
    // aggregation starved the aggregation of execution memory
    // (AGGREGATE_OUT_OF_MEMORY) — a plain count lets cache blocks spill
    // to disk with no operator state competing. The count is also the
    // edge budget probe for the strategy routing below.
    //
    // SKIPPED when the caller's upper bound (`maxDirectedEdges`, e.g.
    // rankDocuments' nv² exact-route bound) already proves the graph is
    // small: below the edge budget the route is decided either way, and
    // below the DISK_ONLY estimate the cache materializes harmlessly
    // under the vertex distinct — the stateless pre-scan proved nothing
    // and cost the sf0.1 bench's tr02 +0.3 s every run. Routing inputs
    // are unchanged wherever the bound does not bind (count ≤ bound ≤
    // budget → same strategy), so this is hash-neutral by construction.
    val edgeCount =
      if (maxDirectedEdges <= cfg.edgeBudget &&
          satMul(maxDirectedEdges, 48L) <= DiskEdgeBytes) maxDirectedEdges
      else e.count()
    // Vertex set = src ∪ dst (equal to src-distinct on the symmetric
    // lists the pipeline builds, but a directed list through the public
    // API gets its sink-only vertices ranked too instead of an NPE).
    // Callers that KNOW their list carries both directions (the whole
    // rankDocuments pipeline — both edge routes mirror every pair) pass
    // `symmetricEdges = true` and the distinct reads half the rows
    // (r14; guide §2.3 — same result set by symmetry, half the shuffle
    // input).
    // Route on a COUNT first — the ids are only ever collected once the
    // count proves they fit the driver-side budget; above the limit the
    // vertex set never leaves the cluster. SKIPPED (r15, same move as
    // the edge-count skip above) when the caller's upper bound
    // (`maxVertices`, e.g. rankDocuments' token-table count — the rank
    // vertex set is a subset of its doc ids) already proves the set
    // fits: the count job and the cache it needed both disappear, and
    // the collect below is the single read. Routing is unchanged
    // wherever the bound does not bind (count <= bound <= limit -> same
    // strategy); the collected id order is the same distinct-output
    // order either way.
    val vertices0 =
      (if (symmetricEdges) e.select(col("src"))
       else e.select(col("src")).union(e.select(col("dst"))))
        .distinct()
    val boundedVertices = maxVertices <= cfg.broadcastLimit
    val vertices =
      if (boundedVertices) vertices0
      else vertices0.persist() // count probe + (small path) collect read it once each
    val vertexCount = if (boundedVertices) maxVertices else vertices.count()
    try {
      if (vertexCount <= cfg.broadcastLimit && edgeCount <= cfg.edgeBudget) {
        // Bounded by the check above. The numbering order never reaches
        // the output values: per-destination sums accumulate in edge
        // order within partitions and tree-combine across them.
        // collect-bound: probe-guarded: count() (or the caller's maxVertices bound) <= cfg.broadcastLimit just above, with the distributed ranksDF fallback
        val ids: Array[Any] = vertices.collect().map(_.get(0))
        // Once the compacted primitive arrays materialize, nothing reads
        // the edge DataFrame again — drop both caches BEFORE the
        // iterations so one query's steady heap is the compact arrays
        // alone. (Two concurrent sf1 tr queries holding edge cache +
        // compact each OOM'd an 8 g heap in the round-11 verify.)
        ranksAggregated(e, ids, cfg,
          onCompacted = () => { vertices.unpersist(); e.unpersist() })
      } else ranksShuffled(e, cfg,
        smallVertexSet = vertexCount <= cfg.broadcastLimit,
        symmetricEdges = symmetricEdges)
    } finally {
      // idempotent (no-op when the small path already released them) —
      // and, crucially, still runs when a job ABORTS, so a failed query
      // cannot leak a corpus-scale edge cache into the session and
      // starve every later query (seen at the sf3 stress replica)
      vertices.unpersist()
      e.unpersist()
    }
  }

  /** Small-vector strategy: the edge list is compacted once into cached
    * primitive arrays (no per-edge object, no codegen); out-weight sums
    * and each rank iteration are ONE `treeAggregate` job each — a fused
    * multiply-add into a per-partition accumulator, tree-combined. The
    * normalized weight is applied as `w / ow(src)` inside the iteration:
    * the division is deterministic, so the result is bit-identical to
    * materializing `wn` up front.
    */
  private def ranksAggregated(e: DataFrame, ids: Array[Any],
      cfg: Config, onCompacted: () => Unit = () => ()): DataFrame = {
    val spark = e.sparkSession
    val sc = spark.sparkContext

    val n = ids.length
    val index = new java.util.HashMap[Any, Integer](n * 2)
    var i = 0
    while (i < n) { index.put(ids(i), i); i += 1 }
    val indexB = sc.broadcast(index)

    // Compact once: (srcIdx[], dstIdx[], w[]) triple per partition.
    // Row-based (not typed) so any vertex id type works — EP2 keys
    // sentences by string ids, the document queries by longs.
    val compact = e.rdd
      .mapPartitions { it =>
        val idx = indexB.value
        val ss = new scala.collection.mutable.ArrayBuilder.ofInt
        val ds = new scala.collection.mutable.ArrayBuilder.ofInt
        val ws = new scala.collection.mutable.ArrayBuilder.ofDouble
        it.foreach { row =>
          ss += idx.get(row.get(0)).intValue()
          ds += idx.get(row.get(1)).intValue()
          ws += row.getDouble(2)
        }
        Iterator.single((ss.result(), ds.result(), ws.result()))
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def accumulate(f: ((Array[Int], Array[Int], Array[Double]),
        Array[Double]) => Unit): Array[Double] =
      compact.treeAggregate(new Array[Double](n))(
        seqOp = { (acc, part) => f(part, acc); acc },
        combOp = { (a, b) =>
          var j = 0
          while (j < a.length) { a(j) += b(j); j += 1 }
          a
        })

    // out-weight sums: ow(src) = Σ_out w. This first pass over the
    // compact RDD also MATERIALIZES it under the persist (r14: the
    // separate compact.count() job it replaced proved nothing this
    // pass doesn't — the peak where edge cache and compact coexist is
    // identical), after which the caller releases the edge caches the
    // arrays were built from.
    val ow = accumulate { case ((ss, _, ws), acc) =>
      var j = 0
      while (j < ss.length) { acc(ss(j)) += ws(j); j += 1 }
    }
    onCompacted()
    val owB = sc.broadcast(ow)

    var r = Array.fill(n)(cfg.initRank)
    for (_ <- 1 to cfg.iterations) {
      val rB = sc.broadcast(r)
      val contrib = accumulate { case ((ss, ds, ws), acc) =>
        val rv = rB.value; val o = owB.value
        var j = 0
        while (j < ss.length) {
          acc(ds(j)) += rv(ss(j)) * (ws(j) / o(ss(j)))
          j += 1
        }
      }
      rB.destroy()
      r = contrib.map(c => cfg.initRank + cfg.damping * c)
    }
    compact.unpersist()
    indexB.destroy()
    owB.destroy()
    val idType = e.schema("src").dataType
    spark.createDataFrame(
      sc.parallelize(ids.zip(r).toIndexedSeq.map {
        case (id, rnk) => org.apache.spark.sql.Row(id, rnk)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType, nullable = false),
        org.apache.spark.sql.types.StructField("rnk",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** Large-vector strategy: rank state stays distributed; out-weights
    * are normalized once, then each iteration is a shuffled join +
    * hash-agg with a `localCheckpoint` lineage cut (H5).
    *
    * `smallVertexSet` (vertex count within [[Config.broadcastLimit]],
    * i.e. this route was chosen by the EDGE budget, not vertex count)
    * broadcast-hints the two vertex-sized join sides against the
    * edge-scale `norm`: Catalyst's size estimate for the out-weight
    * aggregate tracks the edge input, so it planned a SortMergeJoin
    * that external-sorted the sf3 replica's ~1 B edges — the spill
    * readers' read-ahead buffers alone blew the 8 g heap. A broadcast
    * keeps the edge side streaming in place; above the limit the
    * joins stay shuffled (a >500 k-vertex relation is no broadcast
    * candidate).
    */
  private def ranksShuffled(e: DataFrame, cfg: Config,
      smallVertexSet: Boolean = false,
      symmetricEdges: Boolean = false): DataFrame = {
    def dim(df: DataFrame): DataFrame = if (smallVertexSet) broadcast(df) else df
    val outSum = e.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    val norm = e.join(dim(outSum), "src")
      .select(col("src"), col("dst"), (col("weight") / col("ow")).as("wn"))
      .persist(cfg.edgeStorage)
    // Full vertex set (src ∪ dst), kept through every iteration: a
    // vertex with no in-edges still holds rank initRank and feeds its
    // out-edges next round — dropping it after one groupBy(dst) would
    // silently zero its contributions on directed inputs. Symmetric
    // lists read src alone (same set, half the distinct input — r14).
    val vertices =
      (if (symmetricEdges) norm.select(col("src").as("id"))
       else norm.select(col("src").as("id"))
         .union(norm.select(col("dst").as("id")))).distinct().persist()
    vertices.count() // materialize both once; reused every iteration
    var r = vertices.withColumn("rnk", lit(cfg.initRank))
    for (_ <- 1 to cfg.iterations) {
      val contrib = norm.join(dim(r), norm("src") === r("id"))
        .groupBy(col("dst"))
        .agg(sum(col("rnk") * col("wn")).as("c"))
        .select(col("dst").as("id"), col("c"))
      // Left join keeps contribution-less vertices at initRank (c = 0).
      r = vertices.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(cfg.initRank) + lit(cfg.damping) * coalesce(col("c"), lit(0.0))).as("rnk"))
        // Cut lineage each round or the plan doubles per iteration (H5).
        .localCheckpoint()
    }
    norm.unpersist()
    vertices.unpersist()
    r
  }

  /** Full document-level pipeline over a (id, text) DataFrame: band filter
    * F2 on raw space-split words, token pipeline, edges, ranks.
    */
  def rankDocuments(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // fanOut BEFORE tokenizing: both the token pipeline and the quadratic
    // similarity self-join that streams over these partitions must use
    // every core, not the scan's (possibly single) input split.
    val vertices = graft.Par.fanOut(docs
      .filter(TextFunctions.spaceWordCount(col(textCol)) > cfg.minWords &&
        TextFunctions.spaceWordCount(col(textCol)) < cfg.maxWords))
      .select(col(idCol).as("id"),
        TextFunctions.textrankTokens(col(textCol), cfg.lemma).as("tokens"))
      .filter(size(col("tokens")) > 0)
      .persist() // read once, joined against itself
    // Flip the edge caches to DISK_ONLY when the quadratic estimate
    // (every vertex pair, both directions, 24 B each) dwarfs the heap —
    // the vertex count is a cache hit, so the probe is ~free. The
    // estimate is applied to the LSH route too: it is an upper bound
    // (candidates are a subset of all pairs), and on a low-diversity
    // corpus the banding degenerates toward all-pairs — the sf3 probe's
    // 31-token vocabulary collided ~every document into shared buckets
    // and tr06's candidate edge set OOM'd an in-heap cache exactly like
    // the exact route's.
    val nv = vertices.count()
    val cfg2 =
      if (quadEdgeBytes(nv) > DiskEdgeBytes)
        cfg.copy(edgeStorage = org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else cfg
    // ranks() is eager (localCheckpoint per iteration), so the inputs are
    // fully consumed by the time it returns — safe to release them; the
    // finally also releases on job abort (no leaked vertex cache).
    // nv² bounds the directed edge count on BOTH routes (LSH candidates
    // are a subset of all pairs), letting ranks() skip its stateless
    // pre-count when the bound proves the graph small.
    try ranks(edges(vertices, cfg2, nv), cfg2,
      maxDirectedEdges = satMul(nv, nv),
      // both edge routes mirror every surviving pair (see
      // similarityEdges / lshSimilarityEdges), so src-distinct is the
      // full vertex set
      symmetricEdges = true,
      // the rank vertex set is a SUBSET of the token table's doc ids
      // (isolated docs drop out), so nv bounds it — below the broadcast
      // limit ranks() skips its vertex count job entirely
      maxVertices = nv)
    finally vertices.unpersist()
  }

  /** G7: top-k by rank with text recovered via an equi-join (not the
    * reference's per-winner `lookup()` jobs — SURVEY §4.1 anti-pattern).
    */
  def summarize(docs: DataFrame, idCol: String, textCol: String, k: Int,
      cfg: Config = Config()): DataFrame = {
    val r = rankDocuments(docs, idCol, textCol, cfg)
      .withColumn("rnk", round(col("rnk"), 6))
      .orderBy(desc("rnk"), col("id"))
      .limit(k)
    r.join(docs.select(col(idCol).as("id"), col(textCol)), "id")
      .orderBy(desc("rnk"), col("id"))
  }
}
