package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.tables.Tables

/** ANN similarity search over `embeddings` (SURVEY §7.5): exact
  * brute-force cosine top-k (oracle-checked) and the LSH-bucketed scale
  * path (rows-only; bucketing uses seeded hyperplanes DuckDB can't
  * reproduce — its recall against s01 is unit-tested).
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
      None)
  )
}
