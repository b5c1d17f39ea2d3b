package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.tables.Tables

/** ANN similarity search over `embeddings` (SURVEY §7.5): exact
  * brute-force cosine top-k, the hyperplane-LSH bucketed path (both
  * oracle-checked — s02's oracle embeds the seeded plane constants as
  * literal data and independently recomputes sign bits, banding, the
  * bucket join and the exact re-rank), and IVF (rows-only: the KMeans
  * quantizer is not reproducible in SQL; recall@full-probe unit-tested).
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

    // IVF ANN: recall vs s01 depends on nProbe/nClusters; rows-only
    // (KMeans not reproducible in SQL), unit-tested for recall@full-probe.
    Q(
      "s03_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val v = vecs(s, dir)
        Similarity.ivfTopK(v, v.filter($"id" < 5), 10,
          nClusters = 16, nProbe = 4, seed = 42L)
          .withColumnRenamed("rank", "rnk")
          .orderBy($"query_id", $"rnk")
      },
      None),

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
      Some(s02OracleSql))
  )

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
