package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.tables.Tables

/** ANN similarity search over `embeddings` (SURVEY §7.5), ALL
  * oracle-checked: exact brute-force cosine top-k; the hyperplane-LSH
  * bucketed path (s02's oracle embeds the seeded plane constants as
  * literal data and independently recomputes sign bits, banding, the
  * bucket join and the exact re-rank); and IVF through the
  * deterministic Lloyd quantizer (s03's oracle recomputes the
  * clustering itself — nothing embedded).
  */
object SimilarityQueries extends QueryProvider {

  private def vecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id".as("id"), Similarity.toDouble($"embedding").as("vec"))
  }

  override val all: Seq[Q] = Seq(

    Q(
      "s01_cosine_topk",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.bruteForceTopK(v, v.filter($"id" < 5), 10)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
             |p AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             |  round(list_cosine_similarity(q.e, v.e), 6) AS cosine
             |  FROM v CROSS JOIN q WHERE q.vec_id <> v.vec_id),
             |r AS (SELECT *, row_number() OVER
             |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM p)
             |SELECT query_id, rnk, neighbor_id, cosine FROM r WHERE rnk <= 10
             |ORDER BY query_id, rnk""".stripMargin),
      bench = true),

    // IVF ANN through the deterministic fixed-iteration Lloyd quantizer
    // — fully oracle-checked: first-k init, 2 unrolled assign/mean
    // rounds (decimal-exact means, fold-identical distances), probe,
    // inverted-list re-rank, all replayed in SQL. The MLlib-KMeans
    // backend stays as an alternative, unit-tested for recall@full-probe.
    Q(
      "s03_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.ivfTopKDeterministic(v, v.filter($"id" < 5), 10,
          nClusters = 16, nProbe = 4, lloydIters = 2)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some(s03OracleSql)),

    Q(
      "s02_lsh_topk",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.lshTopK(v, v.filter($"id" < 5), 10,
          bands = 8, rowsPerBand = 4, seed = 42L, dim = 64)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some(s02OracleSql)),

    // Per-label embedding centroids (long form): posexplode amplifies
    // rows ×dim LOCALLY, then map-side partial aggregation collapses
    // each partition to at most |labels|×dim cells before the shuffle —
    // so the wire cost is the centroid grid, not the corpus. The same
    // shape computes class means for IVF seeding or embedding drift
    // monitoring at 100 TB.
    Q(
      "s04_label_centroids",
      (s, dir) => {
        import s.implicits._
        Tables.embeddings(s, dir)
          .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
          .groupBy($"label", $"dim")
          .agg(round(avg($"v".cast("double")), 6).as("centroid"),
            count(lit(1)).as("n"))
          .orderBy($"label", $"dim")
      },
      Some("""WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
             |x AS (SELECT label, unnest(range(len(e))) AS dim, unnest(e) AS v
             |  FROM v)
             |SELECT label, CAST(dim AS INTEGER) AS dim,
             |round(avg(v), 6) AS centroid, count(*) AS n
             |FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin)),

    // Int8 scalar quantization of the embedding column — the 4×
    // compression step an ANN index applies before storing vectors at
    // scale. Per-vector max-abs scale, `floor(v*127/s + 0.5)` cell
    // codes (floor-form rounding: engine-neutral, unlike each SQL
    // dialect's round-half rule). Pure row-local higher-order array
    // expressions — a narrow map over the scan, no shuffle; the gate
    // checks code sums (order-free reductions of the full code vector)
    // so every cell participates in the hash without 64 columns.
    Q(
      "s05_quantize_int8",
      (s, dir) => {
        import s.implicits._
        val e = transform($"embedding", x => x.cast("double"))
        val ma = greatest(array_max(transform(e, x => abs(x))), lit(1e-12))
        val q = transform(e, x => floor(x * lit(127.0) / $"ma" + lit(0.5)).cast("long"))
        Tables.embeddings(s, dir)
          .select($"vec_id", $"embedding", ma.as("ma"))
          .select($"vec_id", round($"ma", 6).as("max_abs"), q.as("q"))
          .select($"vec_id", $"max_abs",
            aggregate($"q", lit(0L), (acc, x) => acc + x).as("qsum"),
            aggregate($"q", lit(0L), (acc, x) => acc + abs(x)).as("qabssum"),
            array_max($"q").cast("long").as("qmax"),
            array_min($"q").cast("long").as("qmin"))
          .orderBy($"vec_id")
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |m AS (SELECT vec_id, e,
             |  greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS ma
             |  FROM v),
             |q AS (SELECT vec_id, ma,
             |  list_transform(e, x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT)) AS qv
             |  FROM m)
             |SELECT vec_id, round(ma, 6) AS max_abs,
             |CAST(list_sum(qv) AS BIGINT) AS qsum,
             |CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS qabssum,
             |list_max(qv) AS qmax, list_min(qv) AS qmin
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Exact k-NN graph with mutual-edge flags over a bounded slice —
    // the consumer structure for semantic-dedup clustering / diversity
    // sampling. Mutuality is one self-equi-join of the edge list on
    // the reversed key; the oracle replays graph + join relationally.
    Q(
      "s06_knn_graph",
      (s, dir) => {
        import s.implicits._
        Similarity.knnGraph(vecs(s, dir).filter($"id" < 200), 5)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
             |  FROM embeddings WHERE vec_id < 200),
             |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             |  round(list_cosine_similarity(q.e, n.e), 6) AS cosine
             |  FROM v q JOIN v n ON q.vec_id <> n.vec_id),
             |r AS (SELECT *, row_number() OVER
             |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
             |  FROM p),
             |k AS (SELECT query_id, rnk, neighbor_id, cosine
             |  FROM r WHERE rnk <= 5)
             |SELECT k.query_id, k.rnk, k.neighbor_id, k.cosine,
             |(m.query_id IS NOT NULL) AS mutual
             |FROM k LEFT JOIN k m
             |  ON m.query_id = k.neighbor_id AND m.neighbor_id = k.query_id
             |ORDER BY k.query_id, k.rnk""".stripMargin)),

    // Binary-quantized ANN: sign-binarize each embedding into two
    // 32-bit words (16 bytes/vector — the 32× compression that makes
    // brute force practical at scale) and rank by exact Hamming
    // distance, two XOR+popcount ops per pair. All-integer distances:
    // no float rounding anywhere in the result. The oracle recomputes
    // the bit packing as the same 32-term conditional sums and replays
    // XOR/popcount — hash-for-hash.
    Q(
      "s07_hamming_topk",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.hammingTopK(v, v.filter($"id" < 5), 10)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some(s07OracleSql)),

    // PQ asymmetric-distance search (the ADC scan of Jégou et al.,
    // completing e04's codebooks): the database is scanned as 4 codes
    // per vector; each query ships a broadcast 4×4 distance lookup
    // table and a neighbor's distance is 4 lookups summed in subspace
    // order — no full-precision vector moves after encoding. The
    // oracle recomputes the four Lloyd chains, the LUTs, and the same
    // left-associated sum; ranks are over the 6dp-rounded distance
    // with neighbor-id tiebreaks.
    Q(
      "s08_pq_adc",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.pqAdcTopK(v,
          v.filter($"id" < 5).select($"id".as("qid"), $"vec"),
          k = 10, m = 4, subDim = 16, nClusters = 4, lloydIters = 2)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some(s08OracleSql)),

    // HITS hubs/authorities over the exact kNN graph (s06's edges):
    // which embeddings are pointed AT by many good hubs (authorities ≈
    // density centers) vs point TO many good authorities. Three
    // mutual-reinforcement rounds, every scatter an exact-decimal sum
    // and every norm √(exact Σs²), so the oracle replays the whole
    // trajectory — knn edges, 6 scatters, 6 norms — bit-for-bit.
    Q(
      "s09_hits",
      (s, dir) => {
        import s.implicits._
        val edges = Similarity.knnGraph(vecs(s, dir).filter($"id" < 200), 5)
          .select($"query_id".as("src"), $"neighbor_id".as("dst"))
        graft.operators.Hits.hits(edges, iters = 3)
          .orderBy($"id")
      },
      Some(s09OracleSql(3))),

    // MMR diverse top-5 from the 20 most query-relevant vectors: the
    // greedy λ·rel − (1−λ)·max-sim selection is unrolled into 5 pairs
    // of (argmax, similarity-update) MATERIALIZED CTEs, so the oracle
    // replays every pick and every max-sim state of the Spark loop.
    Q(
      "s10_mmr",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val qv = v.filter($"id" === 0)
          .select($"vec".as("qvec"), Similarity.norm($"vec").as("qn"))
        val rel = v.filter($"id" =!= 0)
          .crossJoin(broadcast(qv))
          .select($"id", $"vec",
            round(Similarity.dot($"vec", $"qvec")
              / (Similarity.norm($"vec") * $"qn"), 6).as("rel"))
          .orderBy(desc("rel"), $"id").limit(20)
        Similarity.mmrSelect(rel, 5, 0.5)
          .select($"rank".cast("long").as("rnk"), $"id".as("neighbor_id"),
            $"rel", $"score")
          .orderBy($"rnk")
      },
      Some(s10OracleSql(5, 20, 0.5))),

    // Hybrid retrieval — the RAG-standard combination: a LEXICAL ranker
    // (t13's BM25 over the query terms) and a DENSE ranker (exact
    // cosine against query vector 0, ids shared with documents) each
    // emit a bounded top-100 list, fused by Reciprocal Rank Fusion
    // (k=60) with no score calibration between the two systems. Scale
    // shape: both rankers already end in bounded lists (BM25 is a
    // posting-join + top-k, dense is a broadcast-query scan + top-k),
    // so the fusion is a constant-size union + one hash agg — corpus
    // size only enters through the rankers, never the fusion.
    Q(
      "s11_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val v = vecs(s, dir)
        val dense = Similarity.bruteForceTopK(v, v.filter($"id" === 0), 100)
          .select($"neighbor_id".as("doc_id"), $"rank".cast("long").as("rnk"))
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val bm = graft.operators.Bm25.score(docs, "doc_id",
          graft.text.TextFunctions.tokenize($"text"),
          Seq("spark", "join", "window"))
        val lex = bm.select($"doc_id", $"score")
          .orderBy(desc("score"), $"doc_id").limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("score"), $"doc_id")))
          .select($"doc_id", $"rnk")
        graft.operators.Rrf.fuse(Seq("dense" -> dense, "bm25" -> lex), k = 60)
          .orderBy(desc("rrf_score"), $"doc_id").limit(30)
      },
      Some(s"""${TextQueries.bm25CtesSql},
              |vv AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
              |qq AS (SELECT e FROM vv WHERE vec_id = 0),
              |pp AS (SELECT vv.vec_id AS doc_id,
              |  round(list_cosine_similarity(qq.e, vv.e), 6) AS cosine
              |  FROM vv CROSS JOIN qq WHERE vv.vec_id <> 0),
              |r1 AS (SELECT doc_id,
              |  row_number() OVER (ORDER BY cosine DESC, doc_id) AS rnk
              |  FROM pp QUALIFY rnk <= 100),
              |r2 AS (SELECT doc_id,
              |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
              |  FROM bm QUALIFY rnk <= 100),
              |f AS (SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
              |  round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + r1.rnk), 0.0), 6)
              |    AS rrf_dense,
              |  round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + r2.rnk), 0.0), 6)
              |    AS rrf_bm25
              |  FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id)
              |SELECT doc_id, rrf_dense, rrf_bm25,
              |  round(rrf_dense + rrf_bm25, 6) AS rrf_score
              |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 30""".stripMargin)),

    // ANN recall@10 — the quality dial every approximate index trades
    // against speed: per query, |LSH top-10 ∩ exact top-10| / 10. Both
    // legs are the production operators (s01's broadcast brute force as
    // truth, s02's banded hyperplane LSH as candidate), so this is the
    // evaluation harness a 100 TB deployment runs on a SAMPLED query
    // set before committing to a bands/rows configuration — the exact
    // leg is the expensive one and is bounded by the sample size, never
    // the corpus. The oracle recomputes both legs and the join in SQL.
    Q(
      "s12_ann_recall",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val q = v.filter($"id" < 20)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(v, q, 10),
          Similarity.lshTopK(v, q, 10, bands = 8, rowsPerBand = 4,
            seed = 42L, dim = 64))
          .orderBy($"query_id")
      },
      Some(s12OracleSql)),

    // LSH band-layout sweep — the tuning run behind s12's single
    // configuration: the SAME 32 hyperplanes sliced as 4×8 / 8×4 /
    // 16×2 bands (fewer, longer bands = higher precision, lower
    // recall), each scored by micro-averaged recall@10 against the
    // shared brute-force truth. The ANN analog of d17's
    // threshold-yield sweep: one bounded grid run on a sampled query
    // set picks the layout before the corpus-scale index build. Truth
    // AND the per-vector sign-bit table are persisted across the three
    // config branches (one broadcast NLJ pass and ONE signature pass,
    // not three — the oracle's shared `bits` CTE, mirrored); micro
    // recall = Σhits/Σexact stays in integer arithmetic until one
    // final division.
    Q(
      "s13_lsh_band_sweep",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val q = v.filter($"id" < 20)
        val truth = Similarity.bruteForceTopK(v, q, 10)
          .select($"query_id", $"neighbor_id").persist()
        val planes = Similarity.hyperplanes(32, 64, 42L)
        val bits = v.select($"id", $"vec",
          Similarity.signBits($"vec", planes).as("bits")).persist()
        val qbits = bits.filter($"id" < 20)
        val configs = Seq((4, 8), (8, 4), (16, 2))
        configs.map { case (b, r) =>
          Similarity.recallAtK(truth,
            Similarity.lshTopKFromBits(bits, qbits, 10,
              bands = b, rowsPerBand = r))
            .agg(sum($"n_exact").as("sum_exact"), sum($"n_hit").as("sum_hit"))
            .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
              $"sum_exact", $"sum_hit",
              round($"sum_hit" * 1.0 / $"sum_exact", 6).as("micro_recall"))
        }.reduce(_ unionAll _)
          .orderBy($"bands")
      },
      Some(s13OracleSql)),

    // Cluster-balanced diversity sampling (see
    // Similarity.clusterBalancedSample) — the SemDeDup/DataComp
    // follow-on to d12: per-Lloyd-cluster fixed quota in FNV-hash
    // order; the oracle recomputes the clustering AND the quota
    // windows entirely in SQL.
    Q(
      "s14_cluster_balanced_sample",
      (s, dir) => {
        import s.implicits._
        Similarity.clusterBalancedSample(vecs(s, dir), nClusters = 16,
            lloydIters = 2, quota = 32)
          .orderBy($"cluster")
      },
      Some(s"""WITH ${LloydSql.ctes(16, 2)},
              |h0 AS (SELECT cluster, id,
              |    ${FnvSql.ofString("CAST(id AS VARCHAR)")} AS fh
              |  FROM af),
              |h AS (SELECT cluster, id,
              |    CAST(CASE WHEN fh >= 9223372036854775808::HUGEINT
              |      THEN fh - 18446744073709551616::HUGEINT
              |      ELSE fh END AS BIGINT) AS hh
              |  FROM h0),
              |r AS (SELECT cluster, id, row_number() OVER
              |  (PARTITION BY cluster ORDER BY hh, id) AS rk FROM h)
              |SELECT cluster, count(*) AS n_total,
              |  CAST(sum(CASE WHEN rk <= 32 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_kept,
              |  CAST(sum(CASE WHEN rk <= 32 THEN id ELSE 0 END) AS BIGINT)
              |    AS kept_idsum
              |FROM r GROUP BY cluster ORDER BY cluster""".stripMargin)),

    // Matryoshka retrieval sweep (Kusupati et al. 2022): recall@10 of
    // cosine search over TRUNCATED embedding prefixes (8/16/32 dims)
    // against the full-64-dim truth — the eval that picks the serving
    // dimension before an MRL deployment trades index cost for recall.
    // One pairwise pass computes every resolution's cosine (the slices
    // ride the same scan — the expensive part is the pair join, not
    // the per-pair arithmetic); micro recall stays in integer counts
    // until one final division, like s13.
    Q(
      "s16_matryoshka_recall",
      (s, dir) => {
        import s.implicits._
        val dims = Seq(8, 16, 32, 64)
        val v = vecs(s, dir)
        val q = v.filter($"id" < 20)
          .select($"id".as("qid"), $"vec".as("qv"))
        def cosD(d: Int) = {
          val (a, b) = (slice($"qv", 1, d), slice($"vec", 1, d))
          round(Similarity.dot(a, b) /
            (Similarity.norm(a) * Similarity.norm(b)), 6).as(s"cos$d")
        }
        val pairs = v.crossJoin(broadcast(q)).filter($"qid" =!= $"id")
          .select($"qid" +: $"id" +: dims.map(cosD): _*)
          .persist()
        def top(d: Int) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"qid").orderBy(col(s"cos$d").desc, $"id")
          pairs.withColumn("rn", row_number().over(w))
            .filter($"rn" <= 10).select($"qid", $"id")
        }
        val truth = top(64).persist()
        val tn = truth.agg(count(lit(1)).as("truth_pairs"))
        dims.map { d =>
          top(d).join(truth, Seq("qid", "id"))
            .agg(count(lit(1)).as("hits"))
            .crossJoin(broadcast(tn))
            .select(lit(d).as("dims"), $"truth_pairs", $"hits",
              round($"hits".cast("double") / $"truth_pairs", 6)
                .as("recall"))
        }.reduce(_ unionByName _).orderBy($"dims")
      },
      Some(s16OracleSql)),

    // IVFADC — the full billion-scale index (coarse quantizer + residual
    // product quantization + per-probe ADC lookup tables), composed from
    // the same deterministic Lloyd core as s03/s08 so DuckDB recomputes
    // the coarse clustering, the residuals, all four PQ codebooks, the
    // per-(query, probed-list) LUTs and the final ranking bit-for-bit.
    Q(
      "s15_ivfadc",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.ivfAdcTopK(v,
          v.filter($"id" < 5).select($"id".as("qid"), $"vec"),
          k = 10, nClusters = 16, nProbe = 4, coarseIters = 2,
          m = 4, subDim = 16, pqClusters = 4, pqIters = 2)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      Some(s15OracleSql)),

    // IVFADC recall@10 against exact-cosine truth — the s12-style eval
    // for the residual-PQ index: the sampled-query harness a deployment
    // runs before committing to (nProbe, m, pqClusters). Truth is
    // bounded by the query sample; the approx leg is the s15 pipeline.
    Q(
      "s17_ivfadc_recall",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val q = v.filter($"id" < 5)
        Similarity.recallAtK(
          Similarity.bruteForceTopK(v, q, 10),
          Similarity.ivfAdcTopK(v, q.select($"id".as("qid"), $"vec"),
            k = 10, nClusters = 16, nProbe = 4, coarseIters = 2,
            m = 4, subDim = 16, pqClusters = 4, pqIters = 2))
          .orderBy($"query_id")
      },
      Some(s17OracleSql)),

    // IVF cluster-balance audit (s21) — the index-health check run
    // before committing an (nClusters, nProbe) config: per cluster,
    // its population share and mean squared distance to the final
    // centroid of the SAME deterministic Lloyd quantizer s03 searches
    // with. Skewed shares mean hot inverted lists (probe latency) and
    // starving tails (recall); the oracle recomputes the full
    // clustering chain plus the distance aggregate.
    Q(
      "s21_cluster_balance",
      (s, dir) => {
        import s.implicits._
        val (cents, af) = Similarity.lloydClusters(
          vecs(s, dir), nClusters = 16, lloydIters = 2)
        val d = af.join(broadcast(cents), Seq("cluster"))
          .select($"cluster",
            Similarity.sqDist($"vec", $"cv").as("dist"))
        val g = d.groupBy($"cluster")
          .agg(count(lit(1)).as("n"),
            round(sum($"dist".cast("decimal(38,12)")).cast("double")
              / count(lit(1)), 6).as("mean_sqdist"))
        val tot = g.agg(sum($"n").as("tot"))
        g.crossJoin(broadcast(tot))
          .select($"cluster", $"n",
            round($"n" * 1.0 / $"tot", 6).as("share"), $"mean_sqdist")
          .orderBy($"cluster")
      },
      Some(s"""WITH ${LloydSql.ctes(16, 2)},
              |dd AS (SELECT af.cluster,
              |  ${LloydSql.dist("af.e", "c.cv")} AS dist
              |  FROM af JOIN ${LloydSql.finalCentroids(2)} c USING (cluster)),
              |g AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
              |  round(CAST(sum(CAST(dist AS DECIMAL(38,12))) AS DOUBLE)
              |    / count(*), 6) AS mean_sqdist
              |  FROM dd GROUP BY cluster),
              |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
              |SELECT cluster, n, round(n * 1.0 / tot, 6) AS share,
              |  mean_sqdist
              |FROM g CROSS JOIN t ORDER BY cluster""".stripMargin)),

    // Hard-negative mining (Similarity.hardNegatives) — the DPR-style
    // contrastive-training step: per query, the most-similar
    // DIFFERENT-label vectors, with a cosine<0.99 margin dropping
    // suspected false negatives. Rank and margin act on the 6dp-rounded
    // cosine on both sides.
    Q(
      "s18_hard_negatives",
      (s, dir) => {
        import s.implicits._
        val v = Tables.embeddings(s, dir)
          .select($"vec_id".as("id"),
            Similarity.toDouble($"embedding").as("vec"), $"label")
        Similarity.hardNegatives(v, v.filter($"id" < 8), k = 10,
          maxCos = 0.99)
          .orderBy($"query_id", $"rnk")
      },
      Some("""WITH v AS (SELECT vec_id, label,
             |  embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT vec_id, label, e FROM v WHERE vec_id < 8),
             |p AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             |  round(list_cosine_similarity(q.e, v.e), 6) AS cosine
             |  FROM v CROSS JOIN q WHERE v.label <> q.label),
             |f AS (SELECT * FROM p WHERE cosine < 0.99),
             |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |  ORDER BY cosine DESC, neighbor_id) AS rnk FROM f)
             |SELECT query_id, rnk, neighbor_id, cosine FROM r
             |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin)),

    // Filtered vector search (s20) — the vector-DB capability every
    // RAG stack needs: top-k under a metadata predicate (same label as
    // the query). Truth = PRE-filter exact ranking; the approximate
    // leg POST-filters an over-fetched (4k) LSH run — the classic
    // trade-off where a selective predicate starves the candidate set.
    // Output is per-query recall of post-filter vs pre-filter, i.e.
    // the number this harness exists to measure before choosing
    // pre-filtered per-label indexes at corpus scale.
    Q(
      "s20_filtered_ann",
      (s, dir) => {
        import s.implicits._
        val v = Tables.embeddings(s, dir)
          .select($"vec_id".as("id"),
            Similarity.toDouble($"embedding").as("vec"), $"label")
        val q = v.filter($"id" < 20)
        val labels = v.select($"id".as("neighbor_id"),
          $"label".as("nlabel"))
        val qlabels = q.select($"id".as("query_id"),
          $"label".as("qlabel"))
        // pre-filter truth: exact same-label ranking
        val truthPairs = v.crossJoin(
            broadcast(q.select($"id".as("query_id"), $"vec".as("qv"),
              $"label".as("qlabel"), Similarity.norm($"vec").as("qn"))))
          .filter($"label" === $"qlabel" && $"id" =!= $"query_id")
          .select($"query_id", $"id".as("neighbor_id"),
            round(Similarity.dot($"vec", $"qv")
              / (Similarity.norm($"vec") * $"qn"), 6).as("cosine"))
        val wT = org.apache.spark.sql.expressions.Window
          .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
        val truth = truthPairs.withColumn("rnk", row_number().over(wT))
          .filter($"rnk" <= 10).select($"query_id", $"neighbor_id")
        // post-filter leg: over-fetched LSH run, then the label filter
        val post = Similarity.lshTopK(v.select($"id", $"vec"),
            q.select($"id", $"vec"), 40,
            bands = 8, rowsPerBand = 4, seed = 42L, dim = 64)
          .join(broadcast(labels), Seq("neighbor_id"))
          .join(broadcast(qlabels), Seq("query_id"))
          .filter($"nlabel" === $"qlabel")
          .withColumn("rnk2", row_number().over(wT))
          .filter($"rnk2" <= 10).select($"query_id", $"neighbor_id")
        Similarity.recallAtK(truth, post).orderBy($"query_id")
      },
      Some(s20OracleSql)),

    // NDCG@10 of the s02 LSH run against exact-cosine truth
    // (Similarity.ndcgAtK) — the rank-AWARE companion to s12's recall:
    // graded relevance k+1-rank from the truth ordering, standard
    // (2^rel-1)/log2(pos+1) gains, per-query IDCG. The oracle replays
    // both retrieval legs (shared with s12) plus the decimal-summed
    // gain arithmetic.
    Q(
      "s19_ann_ndcg",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val q = v.filter($"id" < 20)
        Similarity.ndcgAtK(
          Similarity.bruteForceTopK(v, q, 10),
          Similarity.lshTopK(v, q, 10, bands = 8, rowsPerBand = 4,
            seed = 42L, dim = 64),
          k = 10)
          .orderBy($"query_id")
      },
      Some(s19OracleSql)),

    // Margin-based candidate mining (Artetxe & Schwenk 2019, the
    // CCMatrix/LASER bitext-mining criterion): raw cosine over-selects
    // hub vectors that are close to EVERYTHING, so each pair's score is
    // normalized by both endpoints' average k-NN cosine —
    // margin(x,y) = cos(x,y) / (avgNN_k(x)/2 + avgNN_k(y)/2). The
    // corpus splits into src (even ids) / tgt (odd ids) to mimic the
    // two-language shape; output = each pooled query's best tgt by
    // margin. Scale shape: the query pool is bounded (the s12-style
    // sampled harness); at 100 TB both NN legs ride the ANN index
    // (s15's IVFADC) and the margin is pure post-processing on k+1
    // cosines per query — the exact pooled version here is the
    // oracle-able truth the index route is measured against.
    // Determinism: cosines rounded to 6dp first; the top-4 penalty
    // sums are exact DECIMAL adds; margin = (2k·cos)/(sq+st) in one
    // fixed double op order, rounded to 6dp on both engines.
    Q(
      "s22_margin_mining",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val q = v.filter($"id" % 2 === 0 && $"id" < 200)
          .select($"id".as("qid"), $"vec".as("qv"),
            Similarity.norm($"vec").as("qn"))
        val t = v.filter($"id" % 2 === 1)
          .select($"id".as("tid"), $"vec".as("tv"),
            Similarity.norm($"vec").as("tn"))
        val p = t.crossJoin(broadcast(q))
          .select($"qid", $"tid",
            round(Similarity.dot($"qv", $"tv") / ($"qn" * $"tn"), 6)
              .as("cos"))
        val (pairs, owns) = graft.Par.cacheIfNew(p)
        val wq = org.apache.spark.sql.expressions.Window.partitionBy($"qid").orderBy(desc("cos"), $"tid")
        val wt = org.apache.spark.sql.expressions.Window.partitionBy($"tid").orderBy(desc("cos"), $"qid")
        val kq = pairs.withColumn("rk", row_number().over(wq))
          .filter($"rk" <= 4).groupBy($"qid")
          .agg(sum($"cos".cast("decimal(18,6)")).as("sq"))
        val kt = pairs.withColumn("rk", row_number().over(wt))
          .filter($"rk" <= 4).groupBy($"tid")
          .agg(sum($"cos".cast("decimal(18,6)")).as("st"))
        val wbest = org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy(desc("margin"), $"tid")
        val out = pairs.join(kq, "qid").join(kt, "tid")
          .withColumn("margin",
            round((lit(8.0) * $"cos") / ($"sq" + $"st").cast("double"), 6))
          .withColumn("rk", row_number().over(wbest))
          .filter($"rk" === 1)
          .select($"qid".as("query_id"), $"tid".as("match_id"),
            $"cos".as("cosine"), $"margin")
          .orderBy($"query_id")
        // result is query-pool-sized: checkpoint it, release the pair cache
        if (owns) { val cp = out.localCheckpoint(); pairs.unpersist(); cp }
        else out
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT vec_id AS qid, e FROM v
             |  WHERE vec_id % 2 = 0 AND vec_id < 200),
             |t AS (SELECT vec_id AS tid, e FROM v WHERE vec_id % 2 = 1),
             |p AS MATERIALIZED (SELECT q.qid, t.tid,
             |  round(list_cosine_similarity(q.e, t.e), 6) AS cos
             |  FROM q CROSS JOIN t),
             |kq AS (SELECT qid, sum(CAST(cos AS DECIMAL(18,6))) AS sq FROM (
             |  SELECT qid, cos, row_number() OVER
             |    (PARTITION BY qid ORDER BY cos DESC, tid) AS rk FROM p)
             |  WHERE rk <= 4 GROUP BY qid),
             |kt AS (SELECT tid, sum(CAST(cos AS DECIMAL(18,6))) AS st FROM (
             |  SELECT tid, cos, row_number() OVER
             |    (PARTITION BY tid ORDER BY cos DESC, qid) AS rk FROM p)
             |  WHERE rk <= 4 GROUP BY tid),
             |m AS (SELECT p.qid, p.tid, p.cos,
             |  round((8.0 * p.cos) / CAST(kq.sq + kt.st AS DOUBLE), 6) AS margin
             |  FROM p JOIN kq USING (qid) JOIN kt USING (tid)),
             |b AS (SELECT *, row_number() OVER
             |  (PARTITION BY qid ORDER BY margin DESC, tid) AS rk FROM m)
             |SELECT qid AS query_id, tid AS match_id, cos AS cosine, margin
             |FROM b WHERE rk = 1 ORDER BY query_id""".stripMargin))
  )

  /** s20: pre-filter exact truth (same-label cosine ranking) vs the
    * post-filtered over-fetched LSH leg, recall-scored per query.
    */
  private lazy val s20OracleSql: String = {
    val planes = Similarity.hyperplanes(32, 64, 42L)
    val planesSql = planes.map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    s"""WITH v AS (SELECT vec_id AS id, label,
       |  embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT id, label, e FROM v WHERE id < 20),
       |px AS (SELECT q.id AS query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.e, v.e), 6) AS cosine
       |  FROM v CROSS JOIN q
       |  WHERE q.id <> v.id AND v.label = q.label),
       |rx AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM px),
       |ex AS (SELECT query_id, neighbor_id FROM rx WHERE rnk <= 10),
       |pl AS (SELECT unnest(range(32)) AS pi, unnest($planesSql) AS pv),
       |bits AS (SELECT id, pi // 4 AS band,
       |    string_agg(CASE WHEN list_inner_product(e, pv) >= 0
       |      THEN '1' ELSE '0' END, '' ORDER BY pi) AS key
       |  FROM v CROSS JOIN pl GROUP BY id, pi // 4),
       |cand AS (SELECT DISTINCT qb.id AS query_id, vb.id AS neighbor_id
       |  FROM bits qb JOIN bits vb ON qb.band = vb.band AND qb.key = vb.key
       |  WHERE qb.id < 20 AND qb.id <> vb.id),
       |sc AS (SELECT c.query_id, c.neighbor_id,
       |    round(list_cosine_similarity(qv.e, nv.e), 6) AS cosine
       |  FROM cand c JOIN v qv ON qv.id = c.query_id
       |  JOIN v nv ON nv.id = c.neighbor_id),
       |rl AS (SELECT query_id, neighbor_id, cosine, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM sc),
       |fetched AS (SELECT query_id, neighbor_id, cosine
       |  FROM rl WHERE rnk <= 40),
       |pf AS (SELECT f.query_id, f.neighbor_id, f.cosine
       |  FROM fetched f JOIN v nv ON nv.id = f.neighbor_id
       |  JOIN q ON q.id = f.query_id
       |  WHERE nv.label = q.label),
       |pr AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM pf),
       |al AS (SELECT query_id, neighbor_id, 1 AS hit FROM pr WHERE rnk <= 10)
       |SELECT ex.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(al.hit), 0) AS BIGINT) AS n_hit,
       |  round(coalesce(sum(al.hit), 0) * 1.0 / count(*), 6) AS recall
       |FROM ex LEFT JOIN al USING (query_id, neighbor_id)
       |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin
  }

  /** s19: the s12 truth + LSH legs (rnk columns retained) feeding the
    * NDCG gain/IDCG arithmetic — decimal-cast terms, one divide, 6dp.
    */
  private lazy val s19OracleSql: String = {
    val planes = Similarity.hyperplanes(32, 64, 42L)
    val planesSql = planes.map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT id, e FROM v WHERE id < 20),
       |px AS (SELECT q.id AS query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.e, v.e), 6) AS cosine
       |  FROM v CROSS JOIN q WHERE q.id <> v.id),
       |rx AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM px),
       |relt AS (SELECT query_id, neighbor_id,
       |  CAST(11 - rnk AS DOUBLE) AS rel, rnk FROM rx WHERE rnk <= 10),
       |idcg AS (SELECT query_id,
       |  sum(CAST((pow(2.0, rel) - 1) / log2(CAST(rnk AS DOUBLE) + 1.0)
       |    AS DECIMAL(38,18))) AS idcg
       |  FROM relt GROUP BY query_id),
       |pl AS (SELECT unnest(range(32)) AS pi, unnest($planesSql) AS pv),
       |bits AS (SELECT id, pi // 4 AS band,
       |    string_agg(CASE WHEN list_inner_product(e, pv) >= 0
       |      THEN '1' ELSE '0' END, '' ORDER BY pi) AS key
       |  FROM v CROSS JOIN pl GROUP BY id, pi // 4),
       |cand AS (SELECT DISTINCT qb.id AS query_id, vb.id AS neighbor_id
       |  FROM bits qb JOIN bits vb ON qb.band = vb.band AND qb.key = vb.key
       |  WHERE qb.id < 20 AND qb.id <> vb.id),
       |sc AS (SELECT c.query_id, c.neighbor_id,
       |    round(list_cosine_similarity(qv.e, nv.e), 6) AS cosine
       |  FROM cand c JOIN v qv ON qv.id = c.query_id
       |  JOIN v nv ON nv.id = c.neighbor_id),
       |rl AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM sc),
       |runl AS (SELECT query_id, neighbor_id, rnk FROM rl WHERE rnk <= 10),
       |dcg AS (SELECT runl.query_id,
       |  sum(CASE WHEN relt.rel IS NULL THEN CAST(0 AS DECIMAL(38,18))
       |    ELSE CAST((pow(2.0, relt.rel) - 1)
       |      / log2(CAST(runl.rnk AS DOUBLE) + 1.0) AS DECIMAL(38,18)) END)
       |    AS dcg,
       |  CAST(sum(CASE WHEN relt.rel IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_hits
       |  FROM runl LEFT JOIN relt ON relt.query_id = runl.query_id
       |    AND relt.neighbor_id = runl.neighbor_id
       |  GROUP BY runl.query_id)
       |SELECT dcg.query_id, dcg.n_hits,
       |  round(CAST(dcg.dcg AS DOUBLE) / CAST(idcg.idcg AS DOUBLE), 6)
       |    AS ndcg
       |FROM dcg JOIN idcg USING (query_id) ORDER BY query_id""".stripMargin
  }

  /** s13 oracle: one shared per-plane sign-bit table, re-banded per
    * config (pi // rows), each joined to the shared exact truth and
    * reduced to Σhits/Σexact.
    */
  private lazy val s13OracleSql: String = {
    val planes = Similarity.hyperplanes(32, 64, 42L)
    val planesSql = planes.map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    val configs = Seq((4, 8), (8, 4), (16, 2))
    val perConfig = configs.map { case (b, r) =>
      s"""SELECT $b AS bands, $r AS rows_per_band,
         |  CAST(count(*) AS BIGINT) AS sum_exact,
         |  CAST(coalesce(sum(hit), 0) AS BIGINT) AS sum_hit,
         |  round(coalesce(sum(hit), 0) * 1.0 / count(*), 6) AS micro_recall
         |FROM ex LEFT JOIN (
         |  SELECT query_id, neighbor_id, 1 AS hit FROM (
         |    SELECT sc.query_id, sc.neighbor_id, row_number() OVER
         |      (PARTITION BY sc.query_id
         |       ORDER BY sc.cosine DESC, sc.neighbor_id) AS rnk
         |    FROM (SELECT DISTINCT qb.id AS query_id, vb.id AS neighbor_id
         |          FROM (SELECT id, pi // $r AS band,
         |                  string_agg(bit, '' ORDER BY pi) AS key
         |                FROM bits GROUP BY id, pi // $r) qb
         |          JOIN (SELECT id, pi // $r AS band,
         |                  string_agg(bit, '' ORDER BY pi) AS key
         |                FROM bits GROUP BY id, pi // $r) vb
         |            ON qb.band = vb.band AND qb.key = vb.key
         |          WHERE qb.id < 20 AND qb.id <> vb.id) c
         |    JOIN px sc ON sc.query_id = c.query_id
         |      AND sc.neighbor_id = c.neighbor_id) rr
         |  WHERE rnk <= 10) al
         |USING (query_id, neighbor_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT id, e FROM v WHERE id < 20),
       |px AS (SELECT q.id AS query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.e, v.e), 6) AS cosine
       |  FROM v CROSS JOIN q WHERE q.id <> v.id),
       |rx AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM px),
       |ex AS (SELECT query_id, neighbor_id FROM rx WHERE rnk <= 10),
       |pl AS (SELECT unnest(range(32)) AS pi, unnest($planesSql) AS pv),
       |bits AS (SELECT id, pi,
       |    CASE WHEN list_inner_product(e, pv) >= 0
       |      THEN '1' ELSE '0' END AS bit
       |  FROM v CROSS JOIN pl)
       |SELECT * FROM ($perConfig)
       |ORDER BY bands""".stripMargin
  }

  /** s12 oracle: the s01 brute-force chain and the s02 LSH chain (same
    * embedded plane constants) over 20 query vectors, left-joined on
    * (query, neighbor) and reduced to per-query hit counts.
    */
  private lazy val s12OracleSql: String = {
    val planes = Similarity.hyperplanes(32, 64, 42L)
    val planesSql = planes.map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
       |q AS (SELECT id, e FROM v WHERE id < 20),
       |px AS (SELECT q.id AS query_id, v.id AS neighbor_id,
       |    round(list_cosine_similarity(q.e, v.e), 6) AS cosine
       |  FROM v CROSS JOIN q WHERE q.id <> v.id),
       |rx AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM px),
       |ex AS (SELECT query_id, neighbor_id FROM rx WHERE rnk <= 10),
       |pl AS (SELECT unnest(range(32)) AS pi, unnest($planesSql) AS pv),
       |bits AS (SELECT id, pi // 4 AS band,
       |    string_agg(CASE WHEN list_inner_product(e, pv) >= 0
       |      THEN '1' ELSE '0' END, '' ORDER BY pi) AS key
       |  FROM v CROSS JOIN pl GROUP BY id, pi // 4),
       |cand AS (SELECT DISTINCT qb.id AS query_id, vb.id AS neighbor_id
       |  FROM bits qb JOIN bits vb ON qb.band = vb.band AND qb.key = vb.key
       |  WHERE qb.id < 20 AND qb.id <> vb.id),
       |sc AS (SELECT c.query_id, c.neighbor_id,
       |    round(list_cosine_similarity(qv.e, nv.e), 6) AS cosine
       |  FROM cand c JOIN v qv ON qv.id = c.query_id
       |  JOIN v nv ON nv.id = c.neighbor_id),
       |rl AS (SELECT query_id, neighbor_id, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM sc),
       |al AS (SELECT query_id, neighbor_id, 1 AS hit FROM rl WHERE rnk <= 10)
       |SELECT ex.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(al.hit), 0) AS BIGINT) AS n_hit,
       |  round(coalesce(sum(al.hit), 0) * 1.0 / count(*), 6) AS recall
       |FROM ex LEFT JOIN al USING (query_id, neighbor_id)
       |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin
  }

  /** Unrolled MMR oracle: candidate pool r0 (top-`pool` by relevance),
    * then per stage i an argmax CTE s_i (6dp score, id tiebreak) and a
    * survivor CTE r_i carrying the updated running max-similarity.
    */
  private def s10OracleSql(k: Int, pool: Int, lambda: Double): String = {
    val stages = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (SELECT id, e, rel,
         |  round($lambda*rel - ${1 - lambda}*ms, 6) AS score
         |  FROM r${i - 1} ORDER BY score DESC, id LIMIT 1),
         |r$i AS MATERIALIZED (SELECT r.id, r.e, r.rel,
         |  greatest(r.ms, round(list_cosine_similarity(r.e, s.e), 6)) AS ms
         |  FROM r${i - 1} r CROSS JOIN s$i s WHERE r.id <> s.id)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, id AS neighbor_id, rel, score FROM s$i")
      .mkString("\nUNION ALL ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |qv AS (SELECT e AS qe FROM v WHERE vec_id = 0),
       |relall AS (SELECT v.vec_id AS id, v.e,
       |  round(list_cosine_similarity(qe, v.e), 6) AS rel
       |  FROM v CROSS JOIN qv WHERE v.vec_id <> 0),
       |r0 AS MATERIALIZED (SELECT id, e, rel, 0.0 AS ms
       |  FROM relall ORDER BY rel DESC, id LIMIT $pool),
       |$stages
       |SELECT * FROM ($out) ORDER BY rnk""".stripMargin
  }

  /** s09 oracle: s06's knn-edge chain + the unrolled HITS recurrence
    * (per round: authority scatter/fill/norm, then hub
    * scatter/fill/norm — all MATERIALIZED, PowerLsa discipline).
    */
  private def s09OracleSql(iters: Int): String = {
    def stage(out: String, in: String, key: String, grp: String): String =
      s"""${out}raw AS MATERIALIZED (SELECT e.$grp AS id,
         |  CAST(sum(CAST(x.v AS DECIMAL(38,18))) AS DOUBLE) AS s
         |  FROM e JOIN $in x ON x.id = e.$key GROUP BY e.$grp),
         |${out}f AS MATERIALIZED (SELECT verts.id,
         |  coalesce(r.s, 0.0) AS s FROM verts LEFT JOIN ${out}raw r USING (id)),
         |${out}n AS MATERIALIZED (SELECT
         |  sqrt(CAST(sum(CAST(s * s AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
         |  FROM ${out}f),
         |$out AS MATERIALIZED (SELECT id, s / nrm AS v
         |  FROM ${out}f, ${out}n)""".stripMargin
    val rounds = (1 to iters).map { i =>
      stage(s"a$i", s"h${i - 1}", "src", "dst") + ",\n" +
        stage(s"h$i", s"a$i", "dst", "src")
    }.mkString(",\n")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |  FROM embeddings WHERE vec_id < 200),
       |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |  round(list_cosine_similarity(q.e, n.e), 6) AS cosine
       |  FROM v q JOIN v n ON q.vec_id <> n.vec_id),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM p),
       |e AS MATERIALIZED (SELECT query_id AS src, neighbor_id AS dst
       |  FROM r WHERE rnk <= 5),
       |verts AS MATERIALIZED (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
       |h0 AS MATERIALIZED (SELECT id,
       |  1.0 / sqrt((SELECT count(*) FROM verts)::DOUBLE) AS v FROM verts),
       |$rounds
       |SELECT h$iters.id, round(h$iters.v, 6) AS hub,
       |  round(a$iters.v, 6) AS authority
       |FROM h$iters JOIN a$iters USING (id) ORDER BY id""".stripMargin
  }

  /** s08 oracle: e04's four prefixed Lloyd chains + per-query subspace
    * LUTs + the left-associated 4-term ADC sum, ranked like s01/s07.
    */
  private lazy val s08OracleSql: String = {
    val iters = 2
    val chains = LloydSql.pqChains(m = 4, subDim = 16, nClusters = 4, iters)
    val qs = (0 until 4).map { j =>
      val lo = j * 16 + 1; val hi = (j + 1) * 16
      s"""qs$j AS (SELECT qid, qe[$lo:$hi] AS e FROM q),
         |l$j AS (SELECT qs$j.qid, c.cluster,
         |  ${LloydSql.dist(s"qs$j.e", "c.cv")} AS d$j
         |  FROM qs$j CROSS JOIN s${j}_c$iters c),
         |p$j AS (SELECT a.id, l.qid, l.d$j
         |  FROM s${j}_af a JOIN l$j l ON a.cluster = l.cluster)""".stripMargin
    }
    s"""WITH ${chains.mkString(",\n")},
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
       |  FROM embeddings WHERE vec_id < 5),
       |${qs.mkString(",\n")},
       |j AS (SELECT p0.id, p0.qid, round(((d0 + d1) + d2) + d3, 6) AS adc
       |  FROM p0 JOIN p1 USING (id, qid) JOIN p2 USING (id, qid)
       |    JOIN p3 USING (id, qid)),
       |r AS (SELECT qid AS query_id, id AS neighbor_id, adc,
       |  row_number() OVER (PARTITION BY qid ORDER BY adc, id) AS rnk FROM j)
       |SELECT query_id, rnk, neighbor_id, adc FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** s16 oracle: the same one-pass multi-resolution cosine table (a
    * MATERIALIZED pair CTE holding cos8/16/32/64), per-dim rank CTEs,
    * and the integer-count micro recall against the 64-dim truth.
    */
  private lazy val s16OracleSql: String = {
    val dims = Seq(8, 16, 32, 64)
    val cosCols = dims.map { d =>
      s"round(list_cosine_similarity(q.e[1:$d], n.e[1:$d]), 6) AS cos$d"
    }.mkString(",\n  ")
    val tops = dims.map { d =>
      s"""t$d AS (SELECT qid, nid FROM (SELECT qid, nid, row_number()
         |  OVER (PARTITION BY qid ORDER BY cos$d DESC, nid) AS rn
         |  FROM p) WHERE rn <= 10)""".stripMargin
    }.mkString(",\n")
    val rows = dims.map { d =>
      s"""SELECT $d AS dims,
         |  (SELECT count(*) FROM t64) AS truth_pairs,
         |  (SELECT count(*) FROM t$d a JOIN t64 b
         |    ON a.qid = b.qid AND a.nid = b.nid) AS hits,
         |  round((SELECT count(*) FROM t$d a JOIN t64 b
         |    ON a.qid = b.qid AND a.nid = b.nid)::DOUBLE
         |    / (SELECT count(*) FROM t64), 6) AS recall""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |p AS MATERIALIZED (SELECT q.id AS qid, n.id AS nid,
       |  $cosCols
       |  FROM v n CROSS JOIN v q WHERE q.id < 20 AND q.id <> n.id),
       |$tops
       |$rows
       |ORDER BY dims""".stripMargin
  }

  /** s15 oracle: the whole IVFADC index recomputed in SQL — coarse
    * Lloyd chain, residuals against the final centroids, one prefixed
    * Lloyd chain per residual subspace (PQ codebooks + codes), probe
    * selection with per-probe query residuals, per-subspace LUTs, and
    * the ADC sum in subspace order. Everything downstream of the chains
    * is exact double/int arithmetic, so the only float surfaces are the
    * fold-identical distances the Lloyd chains already pin.
    */
  private lazy val s15ChainSql: String = {
    val (m, subDim, coarseIters, pqIters) = (4, 16, 2, 2)
    val cf = LloydSql.finalCentroids(coarseIters)
    val chains = (0 until m).map { j =>
      val lo = j * subDim + 1; val hi = (j + 1) * subDim
      LloydSql.ctesPrefixed(4, pqIters, s"r${j}_",
        s"SELECT id, rv[$lo:$hi] AS e FROM resid")
    }
    val subs = (0 until m).map { j =>
      val lo = j * subDim + 1; val hi = (j + 1) * subDim
      s"""l$j AS (SELECT s.query_id, s.cluster, c.cluster AS code$j,
         |  ${LloydSql.dist("s.qs", "c.cv")} AS d$j
         |  FROM (SELECT query_id, cluster, qr[$lo:$hi] AS qs FROM probes) s
         |  CROSS JOIN r${j}_c$pqIters c),
         |p$j AS (SELECT cand.query_id, cand.id, l.d$j
         |  FROM cand JOIN r${j}_af rc ON rc.id = cand.id
         |  JOIN l$j l ON l.query_id = cand.query_id
         |    AND l.cluster = cand.cluster AND l.code$j = rc.cluster)""".stripMargin
    }
    s"""${LloydSql.ctes(16, coarseIters)},
       |resid AS MATERIALIZED (SELECT a.id, a.cluster,
       |  list_transform(range(len(a.e)), i -> a.e[i+1] - c.cv[i+1]) AS rv
       |  FROM af a JOIN $cf c USING (cluster)),
       |${chains.mkString(",\n")},
       |probes AS MATERIALIZED (SELECT query_id, cluster,
       |  list_transform(range(len(qe)), i -> qe[i+1] - cv[i+1]) AS qr
       |  FROM (SELECT q.id AS query_id, q.e AS qe, c.cluster, c.cv,
       |    row_number() OVER (PARTITION BY q.id
       |      ORDER BY ${LloydSql.dist("q.e", "c.cv")}, c.cluster) AS rn
       |  FROM v q CROSS JOIN $cf c WHERE q.id < 5) WHERE rn <= 4),
       |cand AS MATERIALIZED (SELECT p.query_id, a.id, a.cluster
       |  FROM probes p JOIN resid a USING (cluster)),
       |${subs.mkString(",\n")},
       |jn AS (SELECT p0.query_id, p0.id,
       |  round(((d0 + d1) + d2) + d3, 6) AS adc
       |  FROM p0 JOIN p1 USING (query_id, id) JOIN p2 USING (query_id, id)
       |    JOIN p3 USING (query_id, id)),
       |r AS (SELECT query_id, id AS neighbor_id, adc, row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc, id) AS rnk FROM jn)""".stripMargin
  }

  private lazy val s15OracleSql: String =
    s"""WITH $s15ChainSql
       |SELECT query_id, rnk, neighbor_id, adc FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin

  /** s17 oracle: the s15 chain's ranked ADC list scored for recall@10
    * against the exact-cosine truth, s12's per-query accounting.
    */
  private lazy val s17OracleSql: String =
    s"""WITH $s15ChainSql,
       |px AS (SELECT q.id AS query_id, n.id AS neighbor_id,
       |    round(list_cosine_similarity(q.e, n.e), 6) AS cosine
       |  FROM v n CROSS JOIN v q WHERE q.id < 5 AND q.id <> n.id),
       |ex AS (SELECT query_id, neighbor_id FROM (SELECT query_id,
       |    neighbor_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rnk FROM px)
       |  WHERE rnk <= 10),
       |al AS (SELECT DISTINCT query_id, neighbor_id, 1 AS hit
       |  FROM r WHERE rnk <= 10)
       |SELECT ex.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(al.hit), 0) AS BIGINT) AS n_hit,
       |  round(coalesce(sum(al.hit), 0) * 1.0 / count(*), 6) AS recall
       |FROM ex LEFT JOIN al USING (query_id, neighbor_id)
       |GROUP BY ex.query_id ORDER BY ex.query_id""".stripMargin

  /** s07 oracle: sign words as literal power-of-two conditional sums
    * (the identical constants the Spark expression folds in), then
    * XOR + popcount re-ranked per query.
    */
  private lazy val s07OracleSql: String = {
    def word(off: Int): String =
      (0 until 32).map(i =>
        s"(CASE WHEN e[${off + i + 1}] > 0.0 THEN ${1L << i} ELSE 0 END)")
        .mkString("(", " + ", ")")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |w AS (SELECT vec_id,
       |  CAST(${word(0)} AS BIGINT) AS w0,
       |  CAST(${word(32)} AS BIGINT) AS w1
       |  FROM v),
       |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |  CAST(bit_count(xor(q.w0, n.w0)) + bit_count(xor(q.w1, n.w1))
       |    AS INTEGER) AS hamming
       |  FROM w n CROSS JOIN w q
       |  WHERE q.vec_id < 5 AND q.vec_id <> n.vec_id),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rnk FROM p)
       |SELECT query_id, rnk, neighbor_id, hamming FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** s03 oracle: the deterministic Lloyd IVF replayed in SQL. Distances
    * are strict left folds (`list_reduce` seeded 0.0) matching Spark's
    * `aggregate` fold order, centroids are exact DECIMAL sums divided in
    * double — so assignments are bit-identical cross-engine.
    */
  private lazy val s03OracleSql: String = {
    val cf = LloydSql.finalCentroids(2)
    s"""WITH ${LloydSql.ctes(16, 2)},
       |probes AS (SELECT query_id, qe, cluster FROM (
       |  SELECT q.id AS query_id, q.e AS qe, c.cluster,
       |    row_number() OVER (PARTITION BY q.id
       |      ORDER BY ${LloydSql.dist("q.e", "c.cv")}, c.cluster) AS rn
       |  FROM v q CROSS JOIN $cf c WHERE q.id < 5) WHERE rn <= 4),
       |sc AS (SELECT p.query_id, a.id AS neighbor_id,
       |    round(list_cosine_similarity(p.qe, a.e), 6) AS cosine
       |  FROM probes p JOIN af a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.id),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** s02 oracle: the 32 seeded hyperplanes are deterministic constants of
    * the query's configuration (seed 42, dim 64) — embedded as literal
    * data, with sign bits, band keys, the bucket join, dedup and the
    * rounded-cosine re-rank all recomputed by DuckDB.
    */
  private lazy val s02OracleSql: String = {
    val planes = Similarity.hyperplanes(32, 64, 42L)
    val planesSql = planes.map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",\n", "]")
    s"""WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
       |pl AS (SELECT unnest(range(32)) AS pi, unnest($planesSql) AS pv),
       |bits AS (SELECT id, pi // 4 AS band,
       |    string_agg(CASE WHEN list_inner_product(e, pv) >= 0
       |      THEN '1' ELSE '0' END, '' ORDER BY pi) AS key
       |  FROM v CROSS JOIN pl GROUP BY id, pi // 4),
       |cand AS (SELECT DISTINCT qb.id AS query_id, vb.id AS neighbor_id
       |  FROM bits qb JOIN bits vb ON qb.band = vb.band AND qb.key = vb.key
       |  WHERE qb.id < 5 AND qb.id <> vb.id),
       |sc AS (SELECT c.query_id, c.neighbor_id,
       |    round(list_cosine_similarity(q.e, n.e), 6) AS cosine
       |  FROM cand c JOIN v q ON q.id = c.query_id JOIN v n ON n.id = c.neighbor_id),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM sc)
       |SELECT query_id, rnk, neighbor_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }
}
