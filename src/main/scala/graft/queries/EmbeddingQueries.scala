package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingStats, Similarity}
import graft.tables.Tables

/** Embedding-column preprocessing (SURVEY §7.5 extensions): per-dim
  * distribution stats and z-score standardization — the scaling stage
  * in front of ANN indexing / clustering. Both fully oracle-checked:
  * DuckDB replays the posexplode as a zipped double-unnest and the
  * standardize as an explode + stats join; the per-vector checksums
  * are rounded (6dp) on both sides, absorbing summation-order float
  * drift between the engines' aggregators.
  */
object EmbeddingQueries extends QueryProvider {

  private def vecs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", Similarity.toDouble($"embedding").as("vec"))
  }

  override val all: Seq[Q] = Seq(

    // Per-dimension count/mean/std/min/max: partial-agg shuffle with
    // #dims groups — reduce side is O(dims) regardless of corpus size.
    Q(
      "e01_dim_stats",
      (s, dir) => {
        import s.implicits._
        EmbeddingStats.dimStats(vecs(s, dir), "vec")
          .select($"dim", $"n",
            round($"mean", 6).as("mean"),
            round($"std", 6).as("std"),
            round($"lo", 6).as("lo"),
            round($"hi", 6).as("hi"))
          .orderBy($"dim")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  unnest(embedding::DOUBLE[]) AS x,
             |  unnest(range(len(embedding))) AS dim
             |  FROM embeddings)
             |SELECT CAST(dim AS INTEGER) AS dim, count(*) AS n,
             |round(avg(x), 6) AS mean,
             |round(stddev_pop(x), 6) AS std,
             |round(min(x), 6) AS lo,
             |round(max(x), 6) AS hi
             |FROM e GROUP BY dim ORDER BY dim""".stripMargin)),

    // z-score standardization: stats broadcast as ONE dim-indexed
    // array row, applied as a row-local transform (zero shuffles).
    // The gate pins per-vector sums in array order; the oracle
    // recomputes the identical z values relationally.
    Q(
      "e02_standardize",
      (s, dir) => {
        import s.implicits._
        EmbeddingStats.standardize(vecs(s, dir), "vec_id", "vec")
          .select($"vec_id",
            round(EmbeddingStats.arraySum($"z"), 6).as("z_sum"),
            round(EmbeddingStats.arraySumSq($"z"), 6).as("z_sumsq"))
          .orderBy($"vec_id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  unnest(embedding::DOUBLE[]) AS x,
             |  unnest(range(len(embedding))) AS dim
             |  FROM embeddings),
             |s AS (SELECT dim, avg(x) AS m, stddev_pop(x) AS sd
             |  FROM e GROUP BY dim),
             |z AS (SELECT vec_id, dim,
             |  CASE WHEN sd = 0 THEN 0.0 ELSE (x - m) / sd END AS z
             |  FROM e JOIN s USING (dim))
             |SELECT vec_id,
             |round(sum(z), 6) AS z_sum,
             |round(sum(z * z), 6) AS z_sumsq
             |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // Matryoshka truncation: keep the first 16 dims and L2-renormalize
    // (the MRL serving trick — 1/4 the vector at 1/4 the cost, cosine
    // stays a dot product). Row-local narrow map, zero shuffles. The
    // truncated norm is a strict left fold the oracle replays with
    // list_reduce (identical IEEE order), and every renormalized cell
    // is hash-checked via the zipped unnest.
    Q(
      "e03_matryoshka",
      (s, dir) => {
        import s.implicits._
        EmbeddingStats.matryoshka(vecs(s, dir), "vec_id", "vec", dims = 16)
          .select($"vec_id", round($"norm", 6).as("norm16"),
            posexplode($"vec").as(Seq("dim", "val")))
          .select($"vec_id", $"norm16", $"dim", round($"val", 6).as("val"))
          .orderBy($"vec_id", $"dim")
      },
      Some("""WITH v AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS e
             |  FROM embeddings),
             |n AS (SELECT vec_id, e,
             |  greatest(sqrt(list_reduce(list_prepend(0.0, list_transform(e,
             |    x -> x * x)), (acc, x) -> acc + x)), 1e-12) AS nrm
             |  FROM v),
             |u AS (SELECT vec_id, nrm,
             |  unnest(range(len(e))) AS dim, unnest(e) AS x FROM n)
             |SELECT vec_id, round(nrm, 6) AS norm16,
             |CAST(dim AS INTEGER) AS dim, round(x / nrm, 6) AS val
             |FROM u ORDER BY vec_id, dim""".stripMargin)),

    // Product quantization (Jégou et al. 2011): the 64-dim vectors
    // split into 4×16-dim subspaces, each vector-quantized with its own
    // deterministic-Lloyd codebook (4 centroids, 2 rounds) — a vector
    // compresses to 4 codes. The oracle RECOMPUTES all four
    // clusterings via LloydSql's prefixed CTE chains (nothing
    // embedded); per-vector reconstruction error sums the four
    // fold-identical subspace distances in subspace order and rounds
    // to 6dp on both engines.
    Q(
      "e04_pq_codes",
      (s, dir) => {
        import s.implicits._
        Similarity.pqCodes(
          vecs(s, dir).select($"vec_id".as("id"), $"vec"),
          m = 4, subDim = 16, nClusters = 4, lloydIters = 2)
          .select($"id".as("vec_id"),
            $"code0".cast("long").as("code0"), $"code1".cast("long").as("code1"),
            $"code2".cast("long").as("code2"), $"code3".cast("long").as("code3"),
            $"err")
          .orderBy($"vec_id")
      },
      Some(e04OracleSql)),

    // Top principal component of the embedding corpus — PCA by the
    // PowerLsa discipline (deterministic power recurrence, exact
    // decimal matvec/covariance sums, Rayleigh λ): the whitening /
    // dominant-direction diagnostic in front of ANN indexing. One
    // corpus-scale pass builds the 64×64 centered covariance
    // (dims²-group hash agg with map-side combine); the 5 iterations
    // then touch only that broadcast-sized table. Fully oracle-checked
    // — the SQL recomputes covariance and recurrence, nothing embedded.
    Q(
      "e05_pca_top",
      (s, dir) => {
        import s.implicits._
        graft.operators.Pca.topComponent(
          vecs(s, dir).select($"vec_id".as("id"), $"vec"), iters = 5)
          .orderBy($"dim")
      },
      Some(e05OracleSql(5))),

    // e05's component put to work: every embedding projected onto the
    // top principal direction (the 1-d whitening feature) plus the
    // component's variance share λ/tr(C). The centered cells join the
    // BROADCAST 64-row direction and reduce per id as exact decimals —
    // one narrow join + one hash agg over the corpus, with the trace a
    // single decimal sum.
    Q(
      "e06_pca_project",
      (s, dir) => {
        import s.implicits._
        graft.operators.Pca.projectTop(
          vecs(s, dir).select($"vec_id".as("id"), $"vec"), iters = 5)
          .select($"id".as("vec_id"), $"proj", $"var_share")
          .orderBy($"vec_id")
      },
      Some(e06OracleSql(5))),

    // Distribution drift between embedding cohorts: linear-kernel
    // Maximum Mean Discrepancy = ‖mean_a − mean_b‖² between every pair
    // of label groups — the closed-form member of the MMD family
    // (Gretton et al. 2012) a corpus-snapshot drift monitor computes
    // (no matrix square roots, unlike FID). Per-dim means are rounded
    // to 6dp and the squared differences summed in exact DECIMAL, so
    // the drift matrix is partition-order-proof. Scale shape: one
    // #labels×#dims partial agg + a dims-sized self-join — the pairwise
    // stage is over GROUP MEANS, never over vectors, so corpus size
    // only enters the first aggregation.
    Q(
      "e07_mmd_drift",
      (s, dir) => {
        import s.implicits._
        val e = Tables.embeddings(s, dir)
          .select($"label", posexplode(Similarity.toDouble($"embedding")))
          .toDF("label", "dim", "x")
        val m = e.groupBy($"label", $"dim")
          .agg(round(avg($"x"), 6).cast("decimal(18,6)").as("m"))
        m.as("a").join(m.as("b"),
            col("a.dim") === col("b.dim") && col("a.label") < col("b.label"))
          .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
            // re-narrow the diff to (18,6) before squaring: (19,6)² would
            // exceed decimal precision 38 and Spark truncates the scale,
            // diverging from DuckDB's exact (38,12) product by 1 ulp
            ((col("a.m") - col("b.m")).cast("decimal(18,6)") *
              (col("a.m") - col("b.m")).cast("decimal(18,6)")).as("d2"))
          .groupBy($"label_a", $"label_b")
          .agg(round(sum($"d2").cast("double"), 9).as("mmd2"))
          .withColumn("mean_dist", round(sqrt($"mmd2"), 6))
          .orderBy($"label_a", $"label_b")
      },
      Some("""WITH e AS (SELECT label,
             |  unnest(embedding::DOUBLE[]) AS x,
             |  unnest(range(len(embedding))) AS dim
             |  FROM embeddings),
             |m AS (SELECT label, dim,
             |  CAST(round(avg(x), 6) AS DECIMAL(18,6)) AS m
             |  FROM e GROUP BY label, dim),
             |p AS (SELECT a.label AS label_a, b.label AS label_b,
             |  (a.m - b.m) * (a.m - b.m) AS d2
             |  FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label),
             |g AS (SELECT label_a, label_b,
             |  round(CAST(sum(d2) AS DOUBLE), 9) AS mmd2
             |  FROM p GROUP BY label_a, label_b)
             |SELECT label_a, label_b, mmd2, round(sqrt(mmd2), 6) AS mean_dist
             |FROM g ORDER BY label_a, label_b""".stripMargin)),

    // Signed (Rademacher) random projection — the Johnson–Lindenstrauss
    // dim-reduce in front of ANN/clustering when even PCA's one
    // covariance pass is too expensive. The projection matrix is never
    // materialized: sign(i, j) = low bit of fnv1a_perm(j, i), computed
    // inside the row-local higher-order functions, so the whole
    // operator is a zero-shuffle map over the vectors (the plan is one
    // scan → project → sort for the gate's ORDER BY). At 100 TB this is
    // the cheapest possible dim-reduce: no training pass, no broadcast
    // state, bit-identical across engines and re-runs. The oracle
    // recomputes each output coordinate relationally (unnest × 8
    // projections × FNV parity); both sides round to 6dp, absorbing the
    // two engines' different summation orders (64 doubles, |err| ≲ 1e-13).
    Q(
      "e08_random_projection",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        val projCols = (0 until 8).map { j =>
          val terms = transform($"vec", (x, i) =>
            when(graft.functions.Fnv.fnv1a_perm(lit(j), i.cast("long"))
                .bitwiseAND(lit(1L)) === 0L, x).otherwise(-x))
          round(aggregate(terms, lit(0.0), (acc, t) => acc + t), 6)
            .as(s"p$j")
        }
        v.select(($"vec_id" +: projCols): _*).orderBy($"vec_id")
      },
      Some {
        val parity = FnvSql.perm("j", "i::HUGEINT")
        // the parity fold depends only on (i, j) — 512 combinations —
        // so it runs over a materialized sign table instead of once per
        // (vector, dim, j) row (sf0.1: 10M folds -> 512; 42 s -> 0.5 s,
        // identical rows)
        s"""WITH e AS (SELECT vec_id,
           |  unnest(embedding::DOUBLE[]) AS x,
           |  unnest(range(len(embedding))) AS i
           |  FROM embeddings),
           |sgn AS MATERIALIZED (SELECT i, j, ($parity % 2 = 0) AS even
           |  FROM (SELECT DISTINCT i FROM e)
           |  CROSS JOIN (SELECT unnest(range(8)) AS j)),
           |t AS (SELECT vec_id, j,
           |  CASE WHEN even THEN x ELSE -x END AS term
           |  FROM e JOIN sgn USING (i)),
           |p AS (SELECT vec_id, j, round(sum(term), 6) AS pv
           |  FROM t GROUP BY vec_id, j)
           |SELECT vec_id,
           |  max(CASE WHEN j = 0 THEN pv END) AS p0,
           |  max(CASE WHEN j = 1 THEN pv END) AS p1,
           |  max(CASE WHEN j = 2 THEN pv END) AS p2,
           |  max(CASE WHEN j = 3 THEN pv END) AS p3,
           |  max(CASE WHEN j = 4 THEN pv END) AS p4,
           |  max(CASE WHEN j = 5 THEN pv END) AS p5,
           |  max(CASE WHEN j = 6 THEN pv END) AS p6,
           |  max(CASE WHEN j = 7 THEN pv END) AS p7
           |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin
      }),

    // Embedding outlier audit — the vector-QA pass run before an index
    // build or a SemDeDup round: per-vector squared z-norm under the
    // per-dimension corpus moments (e01/e02 machinery), global top-20.
    // A fat-tailed z-norm marks corrupt rows, wrong-model embeddings
    // or modality mixups. Ranking acts on the 6dp-rounded norm (ties
    // by id); top-k plans as TakeOrderedAndProject, no global sort.
    Q(
      "e09_outliers",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"z_norm2".desc, $"vec_id")
        graft.operators.EmbeddingStats
          .standardize(vecs(s, dir), "vec_id", "vec")
          .select($"vec_id",
            round(graft.operators.EmbeddingStats.arraySumSq($"z"), 6)
              .as("z_norm2"))
          .orderBy($"z_norm2".desc, $"vec_id").limit(20)
          .withColumn("rnk", row_number().over(w))
          .select($"rnk", $"vec_id", $"z_norm2")
          .orderBy($"rnk")
      },
      Some("""WITH e AS (SELECT vec_id,
             |  unnest(embedding::DOUBLE[]) AS x,
             |  unnest(range(len(embedding))) AS dim
             |  FROM embeddings),
             |s AS (SELECT dim, avg(x) AS m, stddev_pop(x) AS sd
             |  FROM e GROUP BY dim),
             |z AS (SELECT vec_id, dim,
             |  CASE WHEN sd = 0 THEN 0.0 ELSE (x - m) / sd END AS z
             |  FROM e JOIN s USING (dim)),
             |nrm AS (SELECT vec_id, round(sum(z * z), 6) AS z_norm2
             |  FROM z GROUP BY vec_id),
             |r AS (SELECT *, row_number() OVER
             |  (ORDER BY z_norm2 DESC, vec_id) AS rnk FROM nrm)
             |SELECT rnk, vec_id, z_norm2 FROM r WHERE rnk <= 20
             |ORDER BY rnk""".stripMargin)),

    // Equal-byte-budget codec error audit — the serving-codec decision
    // s05 (int8) and e03 (matryoshka truncation) each leave implicit:
    // at 64 bytes per vector, int8 keeps all 64 dims at 8-bit while
    // fp32 keeps the first 16 dims exactly. Per vector, the squared
    // reconstruction error of each codec and the winner. Error terms
    // pass through DECIMAL(38,18) so the per-vector sums are exact and
    // order-free; everything is a narrow row-local fold, no shuffle.
    Q(
      "e10_codec_error",
      (s, dir) => {
        import s.implicits._
        val e = transform($"embedding", x => x.cast("double"))
        val ma = greatest(array_max(transform(e, x => abs(x))), lit(1e-12))
        val base = Tables.embeddings(s, dir)
          .select($"vec_id", e.as("e"), ma.as("ma"))
        base.select($"vec_id",
            round(expr(
              """cast(aggregate(e, cast(0 as decimal(38,18)),
                |  (acc, x) -> cast(acc + cast(
                |    (x - floor(x * 127.0 / ma + 0.5) * ma / 127.0)
                |    * (x - floor(x * 127.0 / ma + 0.5) * ma / 127.0)
                |    as decimal(38,18)) as decimal(38,18))) as double)""".stripMargin), 6)
              .as("sse_int8"),
            round(expr(
              """cast(aggregate(slice(e, 17, size(e) - 16),
                |  cast(0 as decimal(38,18)),
                |  (acc, x) -> cast(acc + cast(x * x as decimal(38,18))
                |    as decimal(38,18)))
                |  as double)""".stripMargin), 6).as("sse_trunc16"))
          .withColumn("winner",
            when($"sse_int8" <= $"sse_trunc16", "int8").otherwise("trunc16"))
          .orderBy($"vec_id")
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
             |  FROM embeddings),
             |m AS (SELECT vec_id, e,
             |  greatest(list_max(list_transform(e, x -> abs(x))), 1e-12)
             |    AS ma FROM v),
             |s AS (SELECT vec_id,
             |  round(CAST(list_sum(list_transform(e, x ->
             |    CAST((x - floor(x * 127.0 / ma + 0.5) * ma / 127.0)
             |      * (x - floor(x * 127.0 / ma + 0.5) * ma / 127.0)
             |      AS DECIMAL(38,18)))) AS DOUBLE), 6) AS sse_int8,
             |  round(CAST(list_sum(list_transform(e[17:],
             |    x -> CAST(x * x AS DECIMAL(38,18)))) AS DOUBLE), 6)
             |    AS sse_trunc16
             |  FROM m)
             |SELECT vec_id, sse_int8, sse_trunc16,
             |  CASE WHEN sse_int8 <= sse_trunc16 THEN 'int8'
             |    ELSE 'trunc16' END AS winner
             |FROM s ORDER BY vec_id""".stripMargin)),

    // Isotropy audit (Mu & Viswanath 2018 "All-but-the-top";
    // Ethayarajh 2019): anisotropic embeddings — a large common mean
    // direction — inflate every cosine and crush retrieval contrast.
    // The mean pairwise cosine over ALL n(n-1) pairs is computed
    // EXACTLY in one pass via the closed form
    //   Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖² = ‖Σu‖² − n   (u unit-normalized)
    // — no pair join, no sampling. A second pass re-measures after
    // mean-centering + renormalizing (the all-but-the-top fix without
    // the PCA step), so the row shows how much of the anisotropy the
    // cheap correction removes. Scale shape: two linear passes + a
    // dims-sized aggregate each; the mean vector broadcasts as one
    // array row (e02's pattern). Determinism: per-dim sums and the
    // broadcast mean are rounded to 6dp on both engines before any
    // squaring.
    Q(
      "e11_isotropy",
      (s, dir) => {
        import s.implicits._
        val u = vecs(s, dir).select($"vec_id",
          expr("transform(vec, x -> x / sqrt(aggregate(vec, 0d, (a, y) -> a + y * y)))")
            .as("u"))
        val (uc, owns) = graft.Par.cacheIfNew(u)
        val dsum = uc.select(posexplode($"u")).toDF("dim", "x")
          .groupBy($"dim").agg(round(sum($"x"), 6).as("sd"))
        val nrow = uc.agg(count(lit(1)).as("n"))
        // mean vector as ONE dim-ordered array row, 6dp-pinned
        val muRow = dsum.crossJoin(broadcast(nrow))
          .select($"dim", round($"sd" / $"n", 6).as("mu"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, mu))), e -> e.mu)")
            .as("muv"))
        val pass1 = dsum.crossJoin(broadcast(nrow))
          .agg(first($"n").as("n"),
            round(sum($"sd" * $"sd"), 6).as("ssq"))
          .select($"n",
            round(($"ssq" - $"n") / ($"n" * ($"n" - 1L)), 6).as("avg_cos"))
        val anis = muRow.select(
          round(sqrt(expr("aggregate(muv, 0d, (a, y) -> a + y * y)")), 6)
            .as("mean_norm"))
        val w2 = uc.crossJoin(broadcast(muRow))
          .select($"vec_id", expr(
            """transform(zip_with(u, muv, (a, b) -> a - b),
              |  x -> x / sqrt(aggregate(zip_with(u, muv, (a, b) -> a - b),
              |    0d, (a, y) -> a + y * y)))""".stripMargin).as("w"))
        val pass2 = w2.select(posexplode($"w")).toDF("dim", "x")
          .groupBy($"dim").agg(round(sum($"x"), 6).as("td"))
          .crossJoin(broadcast(nrow))
          .agg(first($"n").as("n2"), round(sum($"td" * $"td"), 6).as("tsq"))
          .select(round(($"tsq" - $"n2") / ($"n2" * ($"n2" - 1L)), 6)
            .as("avg_cos_centered"))
        val out = pass1.crossJoin(anis).crossJoin(pass2)
          .select($"n", $"mean_norm", $"avg_cos", $"avg_cos_centered")
        if (owns) { val cp = out.localCheckpoint(); uc.unpersist(); cp }
        else out
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |u AS (SELECT vec_id,
             |  list_transform(v, x -> x / sqrt(list_reduce(
             |    list_prepend(0.0::DOUBLE, list_transform(v, y -> y * y)),
             |    (a, b) -> a + b))) AS u FROM e),
             |ex AS (SELECT vec_id, unnest(u) AS x,
             |  unnest(range(len(u))) AS dim FROM u),
             |ds AS (SELECT dim, round(sum(x), 6) AS sd FROM ex GROUP BY dim),
             |nn AS (SELECT count(*) AS n FROM u),
             |p1 AS (SELECT n, round(sum(sd * sd), 6) AS ssq
             |  FROM ds CROSS JOIN nn GROUP BY n),
             |mu AS (SELECT dim, round(sd / n, 6) AS mu
             |  FROM ds CROSS JOIN nn),
             |muv AS (SELECT list(mu ORDER BY dim) AS muv FROM mu),
             |an AS (SELECT round(sqrt(list_reduce(
             |    list_prepend(0.0::DOUBLE, list_transform(muv, y -> y * y)),
             |    (a, b) -> a + b)), 6) AS mean_norm FROM muv),
             |w2 AS (SELECT vec_id, list_transform(
             |    list_transform(range(len(u)), i -> u[i+1] - muv[i+1]),
             |    x -> x / sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             |      list_transform(list_transform(range(len(u)),
             |        i -> u[i+1] - muv[i+1]), y -> y * y)),
             |      (a, b) -> a + b))) AS w
             |  FROM u CROSS JOIN muv),
             |ex2 AS (SELECT unnest(w) AS x, unnest(range(len(w))) AS dim
             |  FROM w2),
             |ts AS (SELECT dim, round(sum(x), 6) AS td FROM ex2 GROUP BY dim),
             |p2 AS (SELECT round(sum(td * td), 6) AS tsq FROM ts)
             |SELECT nn.n, an.mean_norm,
             |  round((p1.ssq - nn.n) / (nn.n * (nn.n - 1)), 6) AS avg_cos,
             |  round((p2.tsq - nn.n) / (nn.n * (nn.n - 1)), 6)
             |    AS avg_cos_centered
             |FROM p1 CROSS JOIN nn CROSS JOIN an CROSS JOIN p2""".stripMargin))
  )

  /** e04 oracle: four prefixed Lloyd chains (one per 16-dim slice) +
    * per-subspace reconstruction error, joined on id. The error sum
    * associates left-to-right in subspace order, exactly as the engine
    * builds it.
    */
  private lazy val e04OracleSql: String = {
    val m = 4; val subDim = 16; val nClusters = 4; val iters = 2
    val chains = LloydSql.pqChains(m, subDim, nClusters, iters)
    val res = (0 until m).map { j =>
      s"""s${j}res AS (SELECT a.id, a.cluster AS code$j,
         |  ${LloydSql.dist("a.e", "c.cv")} AS err$j
         |  FROM s${j}_af a JOIN s${j}_${LloydSql.finalCentroids(iters)} c USING (cluster))"""
        .stripMargin
    }
    s"""WITH ${(chains ++ res).mkString(",\n")}
       |SELECT s0res.id AS vec_id,
       |  CAST(code0 AS BIGINT) AS code0, CAST(code1 AS BIGINT) AS code1,
       |  CAST(code2 AS BIGINT) AS code2, CAST(code3 AS BIGINT) AS code3,
       |  round(((err0 + err1) + err2) + err3, 6) AS err
       |FROM s0res JOIN s1res USING (id) JOIN s2res USING (id)
       |  JOIN s3res USING (id)
       |ORDER BY vec_id""".stripMargin
  }

  /** e05 oracle: the centered covariance from exact decimal sums, then
    * the unrolled power recurrence (PowerLsa's AS MATERIALIZED
    * discipline — without it DuckDB would inline and re-evaluate the
    * chain exponentially) and the Rayleigh quotient.
    */
  private def e05OracleSql(iters: Int): String =
    s"""${pcaChainSql(iters)}
       |SELECT CAST(dim AS INTEGER) AS dim, round(v, 6) AS loading,
       |  round(lambda, 6) AS lambda
       |FROM v$iters CROSS JOIN lam ORDER BY dim""".stripMargin

  /** e06 oracle: the same chain + the broadcast-direction projection,
    * exact-decimal per-id reduce, and λ/tr(C) share (both 6dp-rounded
    * inputs, exactly as the engine computes them).
    */
  private def e06OracleSql(iters: Int): String =
    s"""${pcaChainSql(iters)},
       |ld AS (SELECT dim, round(v, 6) AS loading FROM v$iters),
       |lamr AS (SELECT round(lambda, 6) AS lam FROM lam),
       |pr AS (SELECT cd.id,
       |  CAST(sum(CAST(cd.xc * ld.loading AS DECIMAL(38,18))) AS DOUBLE)
       |    AS proj
       |  FROM cd JOIN ld USING (dim) GROUP BY cd.id),
       |tr AS (SELECT CAST(sum(CAST(xc * xc AS DECIMAL(38,18))) AS DOUBLE)
       |  AS trn FROM cd),
       |sh AS (SELECT round(lam / trn, 6) AS var_share FROM lamr, tr)
       |SELECT id AS vec_id, round(proj, 6) AS proj, var_share
       |FROM pr CROSS JOIN sh ORDER BY vec_id""".stripMargin

  private def pcaChainSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""w$i AS MATERIALIZED (SELECT di AS dim,
         |  CAST(sum(CAST(c * v.v AS DECIMAL(38,18))) AS DOUBLE) AS w
         |  FROM cov JOIN v${i - 1} v ON v.dim = cov.dj GROUP BY di),
         |nrm$i AS MATERIALIZED (SELECT
         |  sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
         |  FROM w$i),
         |v$i AS MATERIALIZED (SELECT dim, w / nrm AS v FROM w$i, nrm$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH cells AS MATERIALIZED (SELECT id, unnest(range(len(e))) AS dim,
       |  unnest(e) AS x FROM
       |  (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)),
       |mu AS MATERIALIZED (SELECT dim,
       |  CAST(sum(CAST(x AS DECIMAL(28,14))) AS DOUBLE) / count(*) AS mu
       |  FROM cells GROUP BY dim),
       |cd AS MATERIALIZED (SELECT c.id, c.dim, c.x - m.mu AS xc
       |  FROM cells c JOIN mu m USING (dim)),
       |cov AS MATERIALIZED (SELECT a.dim AS di, b.dim AS dj,
       |  CAST(sum(CAST(a.xc * b.xc AS DECIMAL(38,18))) AS DOUBLE) AS c
       |  FROM cd a JOIN cd b ON a.id = b.id GROUP BY a.dim, b.dim),
       |dims AS (SELECT DISTINCT di AS dim FROM cov),
       |v0 AS MATERIALIZED (SELECT dim,
       |  1.0 / sqrt((SELECT count(*) FROM dims)::DOUBLE) AS v FROM dims),
       |$rounds,
       |wq AS MATERIALIZED (SELECT di AS dim,
       |  CAST(sum(CAST(c * v.v AS DECIMAL(38,18))) AS DOUBLE) AS w
       |  FROM cov JOIN v$iters v ON v.dim = cov.dj GROUP BY di),
       |lam AS (SELECT CAST(sum(CAST(v.v * w.w AS DECIMAL(38,18)))
       |  AS DOUBLE) AS lambda FROM v$iters v JOIN wq w USING (dim))"""
      .stripMargin
  }
}
