package graft.queries

/** DuckDB replay of `Similarity.lloydClusters` — the deterministic
  * fixed-iteration Lloyd quantizer (first-k init, fold-identical
  * squared distances, decimal-exact means, empty clusters keep their
  * centroid). Shared by the s03 IVF oracle and the d12 SemDeDup oracle:
  * the clustering is recomputed BY SQL, nothing embedded.
  */
private[queries] object LloydSql {

  /** Fold-identical squared euclidean distance (same summation order as
    * the engine's strict left fold).
    */
  def dist(v: String, c: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(len($v)),
       |  i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1]))),
       |  (acc, x) -> acc + x)""".stripMargin

  private def assignCte(name: String, cs: String, vName: String = "v"): String =
    s"""$name AS MATERIALIZED (SELECT id, e, cluster FROM (
       |  SELECT vv.id, vv.e, c.cluster,
       |    row_number() OVER (PARTITION BY vv.id
       |      ORDER BY ${dist("vv.e", "c.cv")}, c.cluster) AS rn
       |  FROM $vName vv CROSS JOIN $cs c) WHERE rn = 1)""".stripMargin

  private def meanCtes(a: String, prev: String, out: String): String =
    s"""${out}m AS (SELECT cluster, list(s / n ORDER BY pos) AS cv
       |  FROM (SELECT cluster, pos,
       |      CAST(sum(CAST(x AS DECIMAL(28,14))) AS DOUBLE) AS s,
       |      count(*) AS n
       |    FROM (SELECT cluster, unnest(range(len(e))) AS pos,
       |        unnest(e) AS x FROM $a)
       |    GROUP BY cluster, pos)
       |  GROUP BY cluster),
       |$out AS MATERIALIZED (SELECT p.cluster, coalesce(m.cv, p.cv) AS cv
       |  FROM $prev p LEFT JOIN ${out}m m USING (cluster))""".stripMargin

  /** Name of the final-centroid CTE for `iters` rounds. */
  def finalCentroids(iters: Int): String = s"c$iters"

  /** CTE chain `v, c0, a1, c1, …, af` over `embeddings`: `af` holds the
    * final assignment (id, e, cluster), `c<iters>` the final centroids.
    */
  def ctes(nClusters: Int, iters: Int): String =
    ctesPrefixed(nClusters, iters, prefix = "",
      vSql = "SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings")

  /** The same chain with every CTE name prefixed and an arbitrary
    * (id, e) source query — lets several independent clusterings (e.g.
    * one per product-quantization subspace, e04) coexist in one WITH.
    * Final assignment = `<prefix>af`, final centroids =
    * `<prefix>c<iters>`.
    */
  /** One prefixed chain per product-quantization subspace (prefix
    * `s<j>_`, slice `[j·subDim+1 : (j+1)·subDim]` of `embeddings`) —
    * shared by the e04 (codes) and s08 (ADC search) oracles.
    */
  def pqChains(m: Int, subDim: Int, nClusters: Int, iters: Int): Seq[String] =
    (0 until m).map { j =>
      val lo = j * subDim + 1; val hi = (j + 1) * subDim
      ctesPrefixed(nClusters, iters, s"s${j}_",
        s"SELECT vec_id AS id, (embedding::DOUBLE[])[$lo:$hi] AS e FROM embeddings")
    }

  def ctesPrefixed(nClusters: Int, iters: Int, prefix: String,
      vSql: String): String = {
    val p = prefix
    val rounds = (1 to iters).map { i =>
      s"${assignCte(s"${p}a$i", s"${p}c${i - 1}", s"${p}v")},\n" +
        meanCtes(s"${p}a$i", s"${p}c${i - 1}", s"${p}c$i")
    }
    (Seq(
      s"${p}v AS MATERIALIZED ($vSql)",
      s"""${p}c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY id) - 1 AS cluster, e AS cv
         |  FROM (SELECT id, e FROM ${p}v ORDER BY id LIMIT $nClusters))""".stripMargin) ++
      rounds :+ assignCte(s"${p}af", s"$p${finalCentroids(iters)}", s"${p}v"))
      .mkString(",\n")
  }
}
