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
             |FROM u ORDER BY vec_id, dim""".stripMargin))
  )
}
