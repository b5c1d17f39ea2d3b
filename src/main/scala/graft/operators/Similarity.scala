package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §7.5). Two paths:
  *
  *  - brute-force cosine top-k: broadcast the (small) query set against
  *    the full vector table — one narrow pass + per-query top-k via
  *    window rank; exact, linear in table size, the correctness oracle;
  *  - random-hyperplane LSH: sign-bit signatures from a fixed seeded
  *    plane set, banded into buckets; candidates = bucket collisions,
  *    then exact cosine re-rank. At 100 TB the bucket join replaces the
  *    all-pairs scan; recall tunes with bands × planes-per-band.
  *
  * Vectors are float in storage; both paths cast to double before any
  * arithmetic so results are reproducible against the DuckDB oracle.
  */
object Similarity {

  def toDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    // fused codegen'd strict left fold — bit-identical to
    // aggregate(zip_with(a, b, _*_), 0.0, _+_) (see DotProduct doc)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def norm(a: Column): Column =
    // sqrt of the fused UNARY self-dot — same fold order as
    // aggregate(a, 0.0, (acc, x) -> acc + x*x), but the array argument
    // is evaluated ONCE per row. dot(a, a) would codegen the child
    // expression twice (binary operands generate independently), which
    // doubles the work whenever callers pass a computed array.
    sqrt(org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SelfDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a))))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector.
    *
    * vecs/queries: (id, vec array<double>). Output: (query_id, neighbor_id,
    * cosine, rank) with rank 1..k, self-matches excluded, ties broken by
    * neighbor id on the 6-decimal-rounded cosine (determinism pin).
    */
  def bruteForceTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Norms are per-VECTOR quantities: compute once per row before the
    // pairwise join (a pairs→rows reduction in aggregate() work). The
    // cosine stays dot/(na·nb) — identical arithmetic to the oracle.
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val v = vecs.select(col("id").as("neighbor_id"), col("vec").as("nv"),
      norm(col("vec")).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    v.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Hard-negative mining for contrastive embedding training (the DPR
    * recipe, Karpukhin et al. 2020 §3.2): for each query vector, the
    * top-k most similar vectors with a DIFFERENT label — the near-miss
    * negatives that carry the strongest training signal. Candidates
    * above `maxCos` are excluded as suspected false negatives
    * (near-duplicates mislabeled across classes).
    *
    * Ranking and margin both act on the 6dp-rounded cosine (determinism
    * pin, ties by neighbor id). This exact form rides the broadcast of
    * the (bounded) query batch, like [[bruteForceTopK]]; at corpus
    * scale the candidate set comes from the IVF/LSH paths instead and
    * the label filter + margin + rank stages are unchanged.
    *
    * vecs/queries: (id, vec, label). Output: (query_id, rnk,
    * neighbor_id, cosine).
    */
  def hardNegatives(vecs: DataFrame, queries: DataFrame, k: Int,
      maxCos: Double): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      col("label").as("qlabel"), norm(col("vec")).as("qn"))
    val v = vecs.select(col("id").as("neighbor_id"), col("vec").as("nv"),
      col("label").as("nlabel"), norm(col("vec")).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    v.crossJoin(broadcast(q))
      .filter(col("qlabel") =!= col("nlabel"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .filter(col("cosine") < maxCos)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cosine"))
  }

  /** Exact k-NN GRAPH with mutuality: every vector's top-k neighbor
    * edges, flagged `mutual` when both endpoints keep each other — the
    * structure semantic-dedup clustering and graph-based diversity
    * sampling consume (mutual edges are the reliable ones; one-way
    * edges often cross cluster boundaries).
    *
    * This exact form is for bounded slices (it rides bruteForceTopK's
    * broadcast); at corpus scale the same graph is assembled from the
    * IVF/LSH candidate paths — the mutuality join below is unchanged
    * either way (one self-equi-join of the edge list on the reversed
    * key, shuffle on (query, neighbor)).
    */
  def knnGraph(vecs: DataFrame, k: Int): DataFrame = {
    val e = bruteForceTopK(vecs, vecs, k)
    val rev = e.select(col("neighbor_id").as("query_id"),
      col("query_id").as("neighbor_id"), lit(true).as("rev"))
    e.join(rev, Seq("query_id", "neighbor_id"), "left")
      .withColumn("mutual", coalesce(col("rev"), lit(false)))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine"), col("mutual"))
  }

  /** Maximal-marginal-relevance greedy re-rank (Carbonell & Goldstein
    * 1998): starting from relevance-scored candidates, repeatedly pick
    * argmax of `λ·rel − (1−λ)·max_sim_to_already_selected` — the
    * diversity-aware top-k a training-data sampler uses to avoid
    * filling a quota with near-duplicates of the best hit.
    *
    * cands: (id: long, vec: array<double>, rel: double), rel already
    * 6dp-rounded. Returns (rank, id, rel, score), rank 1..k.
    *
    * Scale shape: each of the k rounds is ONE distributed pass over the
    * remaining candidates. Only the single selected row is collected
    * per round and re-broadcast as a literal into the next round's
    * max-similarity update, so the candidate set can be arbitrarily
    * large while driver state stays O(k·dim). The per-round argmax is a
    * TakeOrderedAndProject (no global sort); ties break by id on the
    * 6dp-rounded score.
    */
  def mmrSelect(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    val spark = cands.sparkSession
    var rem = cands.select(col("id"), col("vec"), col("rel"),
      lit(0.0).as("ms"))
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    var i = 1
    var done = false
    while (i <= k && !done) {
      val scored = rem.withColumn("score",
        round(lit(lambda) * col("rel") - lit(1 - lambda) * col("ms"), 6))
      // collect-bound: scalar: limit(1) MMR pick per iteration (k iterations total)
      val pick = scored.orderBy(desc("score"), col("id")).limit(1).collect()
      if (pick.isEmpty) done = true
      else {
        val row = pick(0)
        val pid = row.getLong(0)
        val pvec = row.getSeq[Double](1)
        picks += ((i, pid, row.getDouble(2), row.getDouble(4)))
        rem = rem.filter(col("id") =!= pid)
          .withColumn("ms", greatest(col("ms"),
            round(cosine(col("vec"), typedlit(pvec)), 6)))
        // the greedy loop grows the plan by one filter+withColumn per
        // round; past a handful of rounds, cut the lineage so analysis/
        // optimization cost stays O(1) per round instead of O(i)
        if (i % 8 == 0) rem = rem.localCheckpoint()
        i += 1
      }
    }
    spark.createDataFrame(picks.toSeq)
      .toDF("rank", "id", "rel", "score")
  }

  /** One 32-bit sign word of a double vector as a long: bit i set iff
    * vec[off + i] > 0 (little-endian bit order). A 64-dim embedding
    * binarizes into two words — the 32× compression behind
    * Hamming-space ANN. Pure codegen'd arithmetic (a 32-term
    * conditional sum), no UDF.
    */
  def signWord(vec: Column, off: Int): Column =
    (0 until 32).map(i =>
      when(element_at(vec, off + i + 1) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))).reduce(_ + _)

  /** Exact Hamming top-k over sign-binarized vectors (the binary-
    * quantization counterpart of bruteForceTopK): vectors collapse to
    * two 32-bit words each, so the scan side of the pairwise loop is
    * 16 bytes/vector and the distance is two XOR+popcount ops — the
    * brute force that IS practical at scale when vectors are packed.
    * Integer distances make the result hash exactly portable (no float
    * rounding anywhere). Ties broken by neighbor id.
    *
    * For threshold (not top-k) queries the d05 SimHash chunk-banding
    * generates candidates instead of scanning; this path is the exact
    * re-rank both share.
    */
  def hammingTopK(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def packed(df: DataFrame, idName: String) = df.select(
      col("id").as(idName),
      signWord(col("vec"), 0).as(s"${idName}_w0"),
      signWord(col("vec"), 32).as(s"${idName}_w1"))
    val q = packed(queries, "query_id")
    val v = packed(vecs, "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("neighbor_id"))
    v.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming",
        (bit_count(col("query_id_w0").bitwiseXOR(col("neighbor_id_w0"))) +
          bit_count(col("query_id_w1").bitwiseXOR(col("neighbor_id_w1"))))
          .cast("int"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("hamming"))
  }

  /** Sparse TF-IDF cosine document pairs via an inverted-index join —
    * the lexical counterpart of the embedding near-dup paths: documents
    * sharing no token never meet, so the pair space is generated from
    * postings (shuffle keyed on TOKEN), not from an all-pairs scan.
    *
    * Scale shape: (1) `maxDfFrac` prunes stop-tokens BEFORE the
    * self-join — a token in d of n docs contributes O(d²) candidate
    * pairs, so the df cap bounds the quadratic term the way LSH's
    * `maxBucket` does; (2) TF-IDF weights are quantized to integers
    * (`round(w·quantScale)`), so dot products and squared norms are
    * exact integer sums — order-independent under any partitioning,
    * and bit-identical to the oracle with no float-summation drift.
    * The only float ops are the final sqrt/divide per surviving pair.
    *
    * docs: (idCol, tokens). Output (a, b, cosine) with a < b and the
    * 6dp-rounded quantized cosine ≥ tau.
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, tokens: Column,
      quantScale: Double = 1e4, maxDfFrac: Double = 0.5,
      tau: Double = 0.3): DataFrame = {
    import graft.operators.{Dedup => D}
    val base = docs.select(col(idCol).as("id"), tokens.as("toks"))
    val tf = base.select(col("id"), explode(col("toks")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
      // Feeds BOTH the df aggregation and the weight table: unpersisted,
      // the df leg re-derived tf from scratch — a SECOND corpus
      // scan+tokenize per call at every scale (r15 plan audit: two
      // `Scan parquet`+Generate subtrees inside the cached w plan).
      // Narrow (id, tok, tf) rows, same documented no-unpersist-hook
      // cache class as `w` below (r15; guide §2.4 — remove duplicate
      // passes). cacheIfNew: plan-equal calls share the entry.
      .transform(df => graft.Par.cacheIfNew(df)._1)
    val dfT0 = tf.groupBy(col("tok")).agg(countDistinct(col("id")).as("df"))
    // Degenerate-corpus mass probe (r13 verdict task 2; see the Dedup
    // object docs — same floor/budget/policy as lshCandidates). The
    // token self-join's pre-aggregate output is exactly
    // Σ_tok (df_kept choose 2); probing the post-cap Σ df·(df−1)/2
    // over the vocabulary-sized df table UPPER-bounds it (the wq>0
    // filter can only shrink df), erring toward the bounded route.
    // The doc count is column-pruned; the df aggregation above the
    // floor costs one extra corpus pass, after which dfT is persisted
    // so the main plan reuses it. r14: this ONE count job now also
    // supplies n_docs to the weight expression as a LITERAL — the
    // previous one-row corpus aggregate and its broadcast-cross-join
    // into the weight table are gone (one less job + one less
    // BroadcastNestedLoopJoin in the plan; a corpus scalar folds into
    // codegen). Values unchanged: long→double is exact far past any
    // feasible corpus count, and the df-cap / idf arithmetic below is
    // the same IEEE expression either way.
    // collect-bound: scalar: row count (probe floor + n_docs literal)
    val nDocs = base.count()
    val probed = nDocs > D.massProbeMinDocs
    val (dfT, bounded, mass) =
      if (!probed) (dfT0, false, 0L)
      else {
        val d = dfT0.persist()
        // post-cap mass: tokens past the df cap never reach the join.
        // Summed DIRECTED (df·(df−1), exact long arithmetic — SQL `/`
        // on longs would go through double) and halved on the driver
        // to the ida<idb undirected count the groupBy actually sees.
        // collect-bound: scalar: single aggregated row (token-df mass probe)
        val m = d.filter(col("df") <= lit((nDocs * maxDfFrac).toLong))
          .agg(coalesce(sum(col("df") * (col("df") - lit(1L))), lit(0L)))
          .first().getLong(0) / 2L
        (d, D.massRoute("tfidfCosinePairs", m, D.massBudgetPairs), m)
      }
    val w = tf.join(broadcast(dfT), Seq("tok"))
      .filter(col("df") <= lit(nDocs * maxDfFrac))
      .withColumn("wq",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df"))
          * lit(quantScale)).cast("long"))
      .filter(col("wq") > 0)
      .select(col("id"), col("tok"), col("wq"))
      // Feeds BOTH sides of the token self-join plus the norm table —
      // without the persist the scan+tokenize+tf/df subtree replays once
      // per reference (the explain showed 4 full corpus scans). Same
      // no-unpersist-hook rationale as d04's shingle cache: the result
      // is a lazy plan still referencing it; MEMORY_AND_DISK entries are
      // LRU-bounded, not leaked.
      .persist()
    val norms = w.groupBy(col("id")).agg(sum(col("wq") * col("wq")).as("nsq"))
    val prods = w.select(col("tok"), col("id").as("ida"), col("wq").as("wa"))
      .join(w.select(col("tok"), col("id").as("idb"), col("wq").as("wb")),
        Seq("tok"))
      .filter(col("ida") < col("idb"))
    // bounded route (probe tripped): the explicit pair-key exchange
    // replaces the pre-shuffle partial aggregate — the join output
    // streams into the exchange writer instead of a per-task hash map
    // holding a corpus-quadratic pair set, and the post-shuffle sum
    // runs on ~MassPairsPerPartition rows per task. Same rows, same
    // integer sums (order-independent), so values are unchanged. On a
    // diverse corpus the partial aggregate stays — it combines the
    // many-tokens-per-pair fan-in map-side, which the degenerate
    // corpus's quadratic pair space inverts from win to OOM risk.
    val grouped =
      if (!bounded) prods
      else prods.repartition(D.massParts(mass), col("ida"), col("idb"))
    val dot = grouped
      .groupBy(col("ida"), col("idb"))
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dot
      .join(norms.select(col("id").as("ida"), col("nsq").as("nsa")), Seq("ida"))
      .join(norms.select(col("id").as("idb"), col("nsq").as("nsb")), Seq("idb"))
      .withColumn("cosine",
        round(col("dot") / (sqrt(col("nsa")) * sqrt(col("nsb"))), 6))
      .filter(col("cosine") >= tau)
      .select(col("ida").as("a"), col("idb").as("b"), col("cosine"))
  }

  /** Deterministic random hyperplanes: nPlanes × dim, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of a vector against the plane set (one long per
    * band of up to 63 planes is overkill here; we keep an int array —
    * one sign per plane — and band at candidate time).
    */
  def signBits(vec: Column, planes: Array[Array[Double]]): Column = {
    val planeCols = planes.map { p =>
      val planeArr = array(p.map(lit): _*)
      when(dot(vec, planeArr) >= 0, lit(1)).otherwise(lit(0))
    }
    array(planeCols: _*)
  }

  /** Squared euclidean distance as a strict left fold — the SAME
    * summation order as the DuckDB oracle's `list_reduce`, so distances
    * (and therefore argmin assignments) are bit-identical cross-engine.
    */
  def sqDist(a: Column, b: Column): Column =
    // fused codegen'd form of the same fold (see SqDist doc)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SqDist(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Deterministic fixed-iteration Lloyd clustering — shared by the IVF
    * probe (s03) and SemDeDup-style clustered semantic dedup (d12).
    * Returns (final centroids (cluster, cv), assignment (id, vec,
    * cluster)). Init = the `nClusters` lowest-id vectors; each round is
    * assign (argmin squared distance via the fold-identical [[sqDist]],
    * ties to the lowest cluster) + decimal-exact means; empty clusters
    * keep their previous centroid. Every value is a pure function of
    * the data — no RNG, no partition-order float drift — so a SQL
    * oracle recomputes the clustering itself.
    */
  def lloydClusters(vecs: DataFrame, nClusters: Int,
      lloydIters: Int, maxLocalRows: Int = 200000): (DataFrame, DataFrame) = {
    val v0 = vecs.select(col("id"), col("vec"))
    // Scale routing (r15; the PowerLsa.kFactorsAuto pattern): under the
    // row budget, ONE sorted collect feeds a local loop walking the
    // IDENTICAL recurrence (same sqDist left-fold, same ties-to-lowest
    // argmin, same decimal(28,14) sums / double division means, same
    // keep-previous empty-cluster rule — LloydLocalTwinSpec pins the two
    // routes row-equal), replacing 2·lloydIters window+agg rounds of
    // eager checkpoints per call. IVFADC calls this once per subspace,
    // so s15-class queries save ~5× that. Probe and collect are FUSED:
    // orderBy(id).limit(budget+1) caps the driver footprint by
    // construction (a distributed TakeOrdered, not a global sort) — if
    // the limit did not truncate, these are ALL the rows in Spark's own
    // id order; one extra row routes to the unchanged distributed loop
    // (the 100 TB path) and the sample is discarded.
    // collect-bound: probe-guarded: limit(maxLocalRows+1) bounds the collect; the distributed loop is the fallback
    val probeRows = v0.orderBy(col("id")).limit(maxLocalRows + 1).collect()
    if (probeRows.length <= maxLocalRows)
      return lloydClustersLocal(v0, probeRows, nClusters, lloydIters)
    val v = v0
    var centroids = v.orderBy(col("id")).limit(nClusters)
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cluster",
        row_number().over(Window.orderBy(col("cid"))) - 1)
      .select(col("cluster"), col("cv"))
      .localCheckpoint()

    def assign(cs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("dist"), col("cluster"))
      v.crossJoin(broadcast(cs))
        .withColumn("dist", sqDist(col("vec"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("vec"), col("cluster"))
    }

    (1 to lloydIters).foreach { _ =>
      val a = assign(centroids)
      val means = a
        .select(col("cluster"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x").cast("decimal(28,14)")).cast("double").as("s"),
          count(lit(1)).as("n"))
        .withColumn("coord", col("s") / col("n"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("coord")))),
          e => e.getField("coord")).as("cv"))
      // empty clusters keep their previous centroid
      centroids = centroids.select(col("cluster"), col("cv").as("cv0"))
        .join(means, Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("cv"), col("cv0")).as("cv"))
        .localCheckpoint()
    }
    (centroids, assign(centroids))
  }

  /** Bounded-collect twin of [[lloydClusters]] — every step mirrors the
    * DF route 1:1 so values are bit-identical:
    *  - init = the nClusters first rows of the SPARK-sorted collect
    *    (orderBy(id) runs in the collect job, so id-type ordering —
    *    UTF8 binary for strings, numeric otherwise — is Spark's own);
    *  - assign = [[graft.functions.SqDist]]'s strict left-fold
    *    Σ(aᵢ−bᵢ)², argmin scanning clusters ASCENDING with strict `<`
    *    (ties keep the lowest cluster — exactly row_number over
    *    (dist, cluster));
    *  - means = exact decimal(28,14) per-coordinate sums (HALF_UP at
    *    14 fractional digits = Spark's double→decimal cast; a value
    *    whose rounded precision exceeds 28 digits becomes null there
    *    and is SKIPPED here, matching sum-over-null semantics) divided
    *    in double by the member count;
    *  - empty clusters keep their previous centroid.
    */
  private def lloydClustersLocal(v: DataFrame,
      rows: Array[org.apache.spark.sql.Row], nClusters: Int,
      lloydIters: Int): (DataFrame, DataFrame) = {
    import java.math.{BigDecimal => JBig, RoundingMode}
    val spark = v.sparkSession
    val ids: Array[Any] = rows.map(_.get(0))
    val vs: Array[Array[Double]] = rows.map(_.getSeq[Double](1).toArray)
    val n = vs.length
    val kEff = math.min(nClusters, n)
    var cents: Array[Array[Double]] = Array.tabulate(kEff)(i => vs(i))

    def sqd(a: Array[Double], b: Array[Double]): Double = {
      // SqDist.compute's strict left-fold (arrays here are same-dim,
      // null-free doubles — the DF route would NULL on anything else)
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def assignAll(cs: Array[Array[Double]]): Array[Int] =
      vs.map { x =>
        var best = 0
        var bd = sqd(x, cs(0))
        var c = 1
        while (c < cs.length) {
          val d = sqd(x, cs(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        best
      }
    def dec14(x: Double): JBig = {
      val b = JBig.valueOf(x).setScale(14, RoundingMode.HALF_UP)
      if (b.precision > 28) null else b // Spark cast overflow -> null
    }

    var it = 0
    while (it < lloydIters) {
      val asg = assignAll(cents)
      val dim = if (n > 0) vs(0).length else 0
      val sums = Array.fill(kEff, dim)(JBig.ZERO)
      val cnts = new Array[Long](kEff)
      var i = 0
      while (i < n) {
        val c = asg(i)
        cnts(c) += 1
        var p = 0
        while (p < dim) {
          val d = dec14(vs(i)(p))
          if (d != null) sums(c)(p) = sums(c)(p).add(d)
          p += 1
        }
        i += 1
      }
      cents = Array.tabulate(kEff)(c =>
        if (cnts(c) == 0L) cents(c) // empty keeps previous
        else Array.tabulate(dim)(p =>
          sums(c)(p).doubleValue / cnts(c).toDouble))
      it += 1
    }
    val finalAsg = assignAll(cents)

    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val idField = v.schema("id")
    val vecField = v.schema("vec")
    val centroidsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.toIndexedSeq.zipWithIndex.map { case (cv, c) =>
          Row(c, cv.toSeq) }, 1),
      StructType(Seq(StructField("cluster", IntegerType, nullable = false),
        vecField.copy(name = "cv"))))
    val assignedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.indices.map(i => Row(ids(i), vs(i).toSeq, finalAsg(i))), 1),
      StructType(Seq(idField, vecField,
        StructField("cluster", IntegerType, nullable = false))))
    (centroidsDf, assignedDf)
  }

  /** Deterministic fixed-iteration Lloyd quantizer + IVF probe — the
    * oracle-replicable variant of [[ivfTopK]] (same output contract):
    *
    *  - init: the `nClusters` vectors with the smallest ids;
    *  - `lloydIters` unrolled rounds of assign (argmin squared distance,
    *    ties to the lowest cluster) + recompute means;
    *  - means are computed as EXACT decimal sums divided in double:
    *    double summation over rows is partition-order-dependent, which
    *    would let run-to-run float noise flip near-tie assignments;
    *    decimal sums make every centroid a pure function of the data;
    *  - empty clusters keep their previous centroid;
    *  - probe: per query the `nProbe` nearest centroids, exact cosine
    *    re-rank over their inverted lists.
    *
    * Everything is DataFrame ops (posexplode + hash agg + window) — no
    * MLlib, no UDF; recall@full-probe equals brute force for ANY
    * quantizer, which the spec asserts for this one too.
    */
  def ivfTopKDeterministic(vecs: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, lloydIters: Int = 2): DataFrame = {
    val (centroids, af) = lloydClusters(vecs, nClusters, lloydIters)
    val assigned = af
      .select(col("id").as("neighbor_id"), col("vec").as("nv"),
        norm(col("vec")).as("nn"), col("cluster"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("cluster"))
    val probes = queries.select(col("id").as("query_id"), col("vec").as("qv"),
        norm(col("vec")).as("qn"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", sqDist(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cluster"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF (inverted-file) ANN: a seeded KMeans coarse quantizer assigns
    * every vector to a cluster; each query probes only its `nProbe`
    * nearest centroids and exact-ranks within those lists. The classic
    * trade: one cheap clustering pass up front, then each query touches
    * ~nProbe/nClusters of the table instead of all of it.
    * [[ivfTopKDeterministic]] is the oracle-replicable sibling; this
    * MLlib-quantizer form stays as the alternative backend.
    */
  def ivfTopK(vecs: DataFrame, queries: DataFrame, k: Int, nClusters: Int,
      nProbe: Int, seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = vecs.sparkSession
    import spark.implicits._
    val train = vecs.select(col("id"), col("vec"),
      array_to_vector(col("vec")).as("features"))
    val model = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(20)
      .fit(train)
    val assigned = model.transform(train)
      .select(col("id").as("neighbor_id"), col("vec").as("nv"),
        norm(col("vec")).as("nn"), col("prediction").as("cluster"))
    // per-query probe list: nProbe nearest centroids by euclidean distance
    val centroids = model.clusterCenters.map(_.toArray).zipWithIndex
    val probeUdf = udf { (q: Seq[Double]) =>
      centroids.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length) { val x = c(j) - q(j); d += x * x; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
      .withColumn("cluster", explode(probeUdf(col("qv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** ANN top-k via LSH buckets + exact re-rank. bands×rowsPerBand planes.
    * Output schema matches bruteForceTopK (rank may hold < k rows for
    * queries whose buckets are sparse — the recall/cost dial).
    */
  def lshTopK(vecs: DataFrame, queries: DataFrame, k: Int, bands: Int,
      rowsPerBand: Int, seed: Long, dim: Int): DataFrame = {
    val planes = hyperplanes(bands * rowsPerBand, dim, seed)
    def withBits(df: DataFrame) = df.select(col("id"), col("vec"),
      signBits(col("vec"), planes).as("bits"))
    lshTopKFromBits(withBits(vecs), withBits(queries), k, bands, rowsPerBand)
  }

  /** [[lshTopK]] over a PRECOMPUTED per-vector sign-bit table (id, vec,
    * bits) — a band-layout sweep (s13) shares ONE signature pass across
    * layouts instead of recomputing the plane dot products per config.
    */
  def lshTopKFromBits(vecBits: DataFrame, queryBits: DataFrame, k: Int,
      bands: Int, rowsPerBand: Int): DataFrame = {
    def banded(df: DataFrame, idName: String): DataFrame =
      df.select(col("id").as(idName), col("vec"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            j => array_join(slice(col("bits"), j * rowsPerBand + 1, lit(rowsPerBand)), ""))))
        .toDF(idName, if (idName == "query_id") "qv" else "nv", "band", "key")
    val qb = banded(queryBits, "query_id")
    val vb = banded(vecBits, "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), col("neighbor_id"))
    vb.join(qb, Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("nv"))
      .distinct()
      .withColumn("cosine", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Product quantization (Jégou, Douze & Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): split each vector into
    * `m` contiguous subvectors and vector-quantize every subspace with
    * its own (deterministic, [[lloydClusters]]) codebook. A D-dim float
    * vector compresses to m small codes — the memory layout that lets a
    * 100 TB embedding store fit an ANN index in RAM — at the cost of
    * the per-subspace squared reconstruction error reported here.
    *
    * Scale shape: each subspace clustering is the lloydClusters plan
    * (broadcast centroids, one narrow assign pass per iteration — the
    * vectors never shuffle); the m code columns then join on id. m is a
    * small constant, the joins are co-partitioned on the same key, and
    * at scale the m clusterings would run over one shared sample.
    *
    * vecs: (id, vec) with |vec| = m·subDim. Output: (id, code0…code<m-1>,
    * err) where err = sum of per-subspace reconstruction errors in
    * subspace order (fixed IEEE association, 6dp-rounded).
    */
  def pqCodes(vecs: DataFrame, m: Int, subDim: Int, nClusters: Int,
      lloydIters: Int): DataFrame = {
    require(m >= 1 && subDim >= 1, "m and subDim must be >= 1")
    val parts = (0 until m).map { j =>
      val sub = vecs.select(col("id"),
        slice(col("vec"), j * subDim + 1, subDim).as("vec"))
      val (cents, asg) = lloydClusters(sub, nClusters, lloydIters)
      asg.join(broadcast(cents), Seq("cluster"))
        .select(col("id"), col("cluster").as(s"code$j"),
          sqDist(col("vec"), col("cv")).as(s"err$j"))
    }
    val joined = parts.reduce(_.join(_, Seq("id")))
    val errSum = (1 until m).foldLeft(col("err0")) {
      (acc, j) => acc + col(s"err$j")
    }
    joined.select(
      col("id") +: (0 until m).map(j => col(s"code$j")) :+
        round(errSum, 6).as("err"): _*)
  }

  /** PQ asymmetric-distance top-k (the ADC search of Jégou et al.): the
    * database is scanned as CODES ONLY — each query precomputes its
    * per-subspace distance lookup table (m·nClusters floats) to every
    * codebook centroid, and a database vector's approximate distance is
    * m table lookups summed in subspace order.
    *
    * Scale shape: the LUT is queries × m × nClusters rows — broadcast
    * to every executor, so the scan over the code table is a narrow
    * map-side join per subspace (the m joins share the (id, qid) key);
    * no full-precision vector ever moves after encoding. Distances are
    * rounded to 6dp before ranking with neighbor-id tiebreaks, the
    * engine-stable ordering used across the s-family.
    *
    * vecs/queries: (id, vec) / (qid, vec). Output: (query_id, rank,
    * neighbor_id, adc) — self-matches included, exact ADC semantics.
    */
  def pqAdcTopK(vecs: DataFrame, queries: DataFrame, k: Int, m: Int,
      subDim: Int, nClusters: Int, lloydIters: Int): DataFrame = {
    val parts = (0 until m).map { j =>
      val sub = vecs.select(col("id"),
        slice(col("vec"), j * subDim + 1, subDim).as("vec"))
      val (cents, asg) = lloydClusters(sub, nClusters, lloydIters)
      val lut = queries.select(col("qid"),
          slice(col("vec"), j * subDim + 1, subDim).as("qv"))
        .crossJoin(broadcast(cents))
        .select(col("qid"), col("cluster"),
          sqDist(col("qv"), col("cv")).as(s"d$j"))
      asg.select(col("id"), col("cluster"))
        .join(broadcast(lut), Seq("cluster"))
        .select(col("id"), col("qid"), col(s"d$j"))
    }
    val joined = parts.reduce(_.join(_, Seq("id", "qid")))
    val adcSum = (1 until m).foldLeft(col("d0")) {
      (acc, j) => acc + col(s"d$j")
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc"), col("id"))
    joined
      .withColumn("adc", round(adcSum, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("id").as("neighbor_id"), col("adc"))
  }

  /** IVFADC (Jégou/Douze/Schmid 2011, "Product Quantization for Nearest
    * Neighbor Search" §IV — the layout FAISS's IndexIVFPQ implements):
    * a coarse quantizer restricts each query to `nProbe` inverted
    * lists, and ranking inside the probed lists uses product-quantized
    * RESIDUALS — after encoding, the database keeps only (coarse
    * cluster, m codes) per vector, and a query scores a candidate as
    * the sum of m per-subspace lookup-table entries built from its
    * residual (query − probed coarse centroid). This is the index a
    * billion-vector deployment actually ships: full vectors exist only
    * at encode time, and unlike [[pqAdcTopK]] the LUT differs per
    * probed list, which is what makes residual quantization pay.
    *
    * Scale shape: all codebooks (coarse + m PQ) are tiny broadcasts;
    * the LUT is queries × nProbe × m × pqClusters rows, broadcast; the
    * only corpus-sized artifact is the code table, touched via one
    * broadcast semi-restriction on (cluster) plus m broadcast joins on
    * (query, cluster, code) — the code table itself never shuffles.
    *
    * Determinism: residuals are elementwise double subtractions of
    * decimal-exact centroids, distances the strict-left-fold
    * [[sqDist]], and ADC adds the m lookups in subspace order and
    * rounds to 6dp before the (adc, id) tiebreak ranking — so a SQL
    * oracle recomputes the index, codes, LUTs and ranking bit-for-bit.
    *
    * vecs/queries: (id, vec) / (qid, vec). Output: (query_id, rank,
    * neighbor_id, adc) — self-matches included, like [[pqAdcTopK]].
    */
  def ivfAdcTopK(vecs: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, coarseIters: Int,
      m: Int, subDim: Int, pqClusters: Int, pqIters: Int): DataFrame = {
    val (cents, af) = lloydClusters(vecs, nClusters, coarseIters)
    val resid = af.join(broadcast(cents), Seq("cluster"))
      .select(col("id"), col("cluster"),
        zip_with(col("vec"), col("cv"), (a, b) => a - b).as("rv"))
      .persist() // feeds m subspace clusterings + the code assembly
    val parts = (0 until m).map { j =>
      val sub = resid.select(col("id"),
        slice(col("rv"), j * subDim + 1, subDim).as("vec"))
      val (pc, pa) = lloydClusters(sub, pqClusters, pqIters)
      (pc.select(col("cluster").as(s"code$j"), col("cv")),
        pa.select(col("id"), col("cluster").as(s"code$j")))
    }
    val codes = (parts.map(_._2) :+ resid.select(col("id"), col("cluster")))
      .reduce(_.join(_, Seq("id")))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("cluster"))
    val probes = queries
      .select(col("qid").as("query_id"), col("vec").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", sqDist(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cluster"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qr"))
    val cands = codes.join(
      broadcast(probes.select(col("query_id"), col("cluster"))),
      Seq("cluster"))
    val withD = (0 until m).foldLeft(cands) { (acc, j) =>
      val lut = probes.select(col("query_id"), col("cluster"),
          slice(col("qr"), j * subDim + 1, subDim).as("qs"))
        .crossJoin(broadcast(parts(j)._1))
        .select(col("query_id"), col("cluster"), col(s"code$j"),
          sqDist(col("qs"), col("cv")).as(s"d$j"))
      acc.join(broadcast(lut), Seq("query_id", "cluster", s"code$j"))
    }
    val adcSum = (1 until m).foldLeft(col("d0")) {
      (acc, j) => acc + col(s"d$j")
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("id"))
    withD.withColumn("adc", round(adcSum, 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("adc"))
  }

  /** Recall of an approximate neighbor list against the exact one: per
    * query, |approx ∩ truth| / |truth|. Both inputs are (query_id,
    * neighbor_id) result sets (any extra columns ignored); duplicate
    * key rows in EITHER input are collapsed first — a pre-dedup
    * candidate list would otherwise multiply joined rows and silently
    * corrupt both counts. The join is on the composite key — truth
    * side drives, so queries the approx index missed entirely still
    * report recall 0, and approx extras beyond the truth set don't
    * inflate the score.
    *
    * This is the evaluation harness an ANN deployment runs on a SAMPLED
    * query set before committing to an index configuration: the exact
    * leg bounds the cost (it scales with the sample, never the corpus).
    */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("neighbor_id")).distinct()
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
      .withColumn("hit", lit(1L))
    t.join(a, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit") * 1.0 / col("n_exact"), 6).as("recall"))
  }

  /** NDCG@k of a retrieval run against exact-ranking truth — the
    * rank-AWARE companion to [[recallAtK]]: recall says the right
    * neighbors came back, NDCG says they came back in the right ORDER.
    * Graded relevance is derived from the truth ranking itself
    * (rel = k+1-rank, so truth rank 1 carries grade k), gains are the
    * standard (2^rel - 1)/log2(pos + 1), and IDCG is computed per
    * query from its own truth list (short lists normalize correctly).
    *
    * Both legs are per-(query, position) narrow maps plus one
    * per-query aggregate; gain terms pass through DECIMAL(38,18)
    * before summation so the 10-term sums are partition-order-free.
    *
    * truth/run: (query_id, rank, neighbor_id). Output:
    * (query_id, n_hits, ndcg).
    */
  def ndcgAtK(truth: DataFrame, run: DataFrame, k: Int): DataFrame = {
    def gain(rel: Column, pos: Column): Column =
      ((pow(lit(2.0), rel) - 1.0) / log2(pos.cast("double") + 1.0))
        .cast("decimal(38,18)")
    val rels = truth.select(col("query_id"), col("neighbor_id"),
      (lit(k + 1) - col("rank")).cast("double").as("rel"))
    val idcg = truth.select(col("query_id"),
        gain(lit(k + 1) - col("rank"), col("rank")).as("g"))
      .groupBy(col("query_id")).agg(sum(col("g")).as("idcg"))
    val dcg = run.select(col("query_id"), col("rank"), col("neighbor_id"))
      .join(rels, Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"),
        when(col("rel").isNull, lit(java.math.BigDecimal.ZERO)
            .cast("decimal(38,18)"))
          .otherwise(gain(col("rel"), col("rank"))).as("g"),
        when(col("rel").isNull, 0L).otherwise(1L).as("hit"))
      .groupBy(col("query_id"))
      .agg(sum(col("g")).as("dcg"), sum(col("hit")).as("n_hits"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), col("n_hits"),
        round((col("dcg").cast("double") / col("idcg").cast("double")), 6)
          .as("ndcg"))
  }

  /** Cluster-balanced diversity sampling (the SemDeDup/DataComp
    * follow-on): assign every vector to its deterministic Lloyd
    * cluster, keep a fixed per-cluster quota in FNV-hash order — a
    * seedable "random" both engines replay exactly. Balancing by
    * cluster preserves the tail clusters a frequency-proportional
    * sample starves. The per-cluster window bounds sort parallelism by
    * nClusters; the documented 100 TB path swaps row_number for a
    * per-cluster hash threshold (same contract, no global window).
    *
    * Output: (cluster, n_total, n_kept, kept_idsum) — the kept-id sum
    * is the order-free checksum the gate hashes.
    */
  def clusterBalancedSample(vecs: DataFrame, nClusters: Int,
      lloydIters: Int, quota: Int): DataFrame = {
    val (_, af) = lloydClusters(vecs, nClusters, lloydIters)
    val w = Window.partitionBy(col("cluster")).orderBy(col("h"), col("id"))
    af.select(col("cluster"), col("id"),
        graft.functions.Fnv.fnv1a64(col("id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rk") <= quota, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") <= quota, col("id")).otherwise(0L))
          .as("kept_idsum"))
  }
}
