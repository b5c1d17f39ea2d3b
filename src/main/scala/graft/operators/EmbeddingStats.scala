package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension statistics and feature scaling over an embedding
  * column — the preprocessing every vector pipeline runs before
  * indexing/clustering (zero-centered, unit-variance dimensions make
  * cosine/L2 geometry and quantizers behave).
  *
  * Scale shape, 100 TB: `dimStats` is posexplode → partial hash
  * aggregation → one shuffle of (dim, partials) with as many groups as
  * DIMENSIONS (64 here, a few thousand at most in practice) — the
  * reduce side is trivially small no matter the row count.
  * `standardize` broadcasts the dim-indexed stat arrays (one row of
  * 2×dims doubles) and applies a row-local `transform` — no shuffle at
  * all. Neither path ever materializes vectors on the driver.
  */
object EmbeddingStats {

  /** (dim, n, mean, std, lo, hi) per vector dimension. Rows with a
    * null vector are skipped; ragged vectors contribute to the dims
    * they have.
    */
  def dimStats(vecs: DataFrame, vecCol: String): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    vecs
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"),
        avg($"x").as("mean"),
        stddev_pop($"x").as("std"),
        min($"x").as("lo"),
        max($"x").as("hi"))
  }

  /** Dim-indexed stat arrays as ONE broadcastable row:
    * (means: array<double>, stds: array<double>). Order is pinned by
    * sorting the (dim, stat) structs — no window, no single-partition
    * funnel.
    */
  def statArrays(stats: DataFrame): DataFrame = {
    val s = stats.sparkSession
    import s.implicits._
    stats
      .agg(sort_array(collect_list(struct($"dim", $"mean", $"std"))).as("a"))
      .select(expr("transform(a, e -> e.mean)").as("means"),
        expr("transform(a, e -> e.std)").as("stds"))
  }

  /** z-score each component against the per-dim stats: a broadcast
    * nested-loop join against the single stat row, then a row-local
    * transform. Dims with zero variance map to 0 (not NaN/Inf) so a
    * constant dimension can't poison downstream distances.
    */
  def standardize(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val stats = broadcast(statArrays(dimStats(vecs, vecCol)))
    vecs.join(stats)
      .select(col(idCol),
        expr(s"""transform($vecCol, (x, i) ->
                |  CASE WHEN stds[i] = 0.0d THEN 0.0d
                |       ELSE (x - means[i]) / stds[i] END)""".stripMargin)
          .as("z"))
  }

  /** Deterministic array-order sum — matches a SQL list_reduce replay. */
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def arraySumSq(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x * x)

  /** Matryoshka truncation: keep the first `dims` dimensions and
    * L2-renormalize — the MRL serving trick (use a prefix of the
    * embedding at 1/4 the storage/FLOPs, re-unit-normalized so cosine
    * stays a dot product). Row-local narrow map, zero shuffles; the
    * truncated norm is a strict left fold (seed 0.0, array order) so a
    * SQL list_reduce replays it bit-for-bit, and all-zero prefixes are
    * guarded to norm 1e-12 rather than dividing by zero.
    *
    * vecs: (idCol, vecCol array<double>). Output: (id, norm: the
    * truncated prefix's L2 norm, vec: the renormalized prefix).
    */
  def matryoshka(vecs: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame = {
    val prefix = slice(col(vecCol), 1, dims)
    vecs
      .select(col(idCol), prefix.as("pre"))
      .withColumn("norm",
        greatest(sqrt(aggregate(col("pre"), lit(0.0), (a, x) => a + x * x)),
          lit(1e-12)))
      .select(col(idCol), col("norm"),
        transform(col("pre"), x => x / col("norm")).as("vec"))
  }
}
