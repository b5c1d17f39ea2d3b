package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Fnv

/** Properties behind the round-6 additions sk10 (bottom-k-by-hash
  * quantile sample), e08 (signed random projection) and c25 (per-source
  * cap) that the DuckDB hash gate cannot express:
  *
  *  - MERGEABILITY of the bottom-k sample: bottom-k of a union equals
  *    bottom-k of the per-shard bottom-k's — the algebraic fact that
  *    lets WindowGroupLimit's map-side partial top-k compute the exact
  *    sample without a global per-source sort;
  *  - sample-quantile error: the k=64 order-statistic estimate lands
  *    within a bounded rank distance of the exact quantile;
  *  - JL norm preservation: the 8-dim Rademacher projection preserves
  *    squared norms in expectation (E[‖Px‖²] = D·‖x‖²) within the usual
  *    concentration band when averaged over the corpus;
  *  - cap determinism + bound: the c25 survivor set is ≤ N per source
  *    and identical across runs and partitionings.
  */
class BottomKProjectionSpec extends SparkSpec {

  test("bottom-k by hash is mergeable across arbitrary shards") {
    val sp = spark
    import sp.implicits._
    val ids = (1L to 500L).toDF("id")
      .select($"id", Fnv.fnv1a_perm(lit(1), $"id").as("hv"))
    val direct = ids.orderBy($"hv", $"id").limit(64)
      .select($"id").as[Long].collect().toSet
    // shard by id % 7, take each shard's local bottom-64, then global
    val perShard = ids.withColumn("shard", $"id" % 7)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"shard").orderBy($"hv", $"id")))
      .filter($"rk" <= 64)
    val merged = perShard.orderBy($"hv", $"id").limit(64)
      .select($"id").as[Long].collect().toSet
    assert(merged == direct)
  }

  test("sk10 sample quantile is rank-close to the exact quantile") {
    val dir = sf("sf0.01")
    val out = graft.SparkEntry.queries("sk10_bottomk_quantiles")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val m = r.getAs[Long]("m")
      assert(m == math.min(64L, n))
      // the estimate is an actual corpus value between the exact p10
      // and p90 per source — a coarse but scale-free sanity band;
      // the DuckDB gate already pins the exact sample semantics.
      val est = r.getAs[Long]("est_p50")
      val lo = r.getAs[Long]("ex_p25")
      val hi = r.getAs[Long]("ex_p75")
      assert(est >= lo - (hi - lo) && est <= hi + (hi - lo),
        s"est_p50 $est far outside [$lo, $hi] for ${r.getAs[String]("source")}")
    }
  }

  test("e08 preserves squared norms in expectation (JL)") {
    val dir = sf("sf0.01")
    val sp = spark
    import sp.implicits._
    val proj = graft.SparkEntry.queries("e08_random_projection")(spark, dir)
    val projNorm = proj.select(
      (($"p0" * $"p0") + ($"p1" * $"p1") + ($"p2" * $"p2") + ($"p3" * $"p3") +
       ($"p4" * $"p4") + ($"p5" * $"p5") + ($"p6" * $"p6") + ($"p7" * $"p7"))
        .as("pn2"))
      .agg(avg($"pn2")).as[Double].head()
    val origNorm = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b).as("n2"))
      .agg(avg(col("n2"))).as[Double].head()
    // E[‖Px‖²] = D_out · ‖x‖² for Rademacher signs; corpus-averaged
    // ratio concentrates — allow ±15%.
    val ratio = projNorm / (8.0 * origNorm)
    assert(ratio > 0.85 && ratio < 1.15, s"norm ratio $ratio")
  }

  test("c25 cap binds, accounts exactly, and is partition-invariant") {
    val dir = sf("sf0.01")
    val out = graft.SparkEntry.queries("c25_source_cap")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("kept") <= 64L)
      assert(r.getAs[Long]("kept") + r.getAs[Long]("dropped") ==
        r.getAs[Long]("n_docs"))
    }
    // determinism across a different physical partitioning of the input
    val n0 = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "11")
      val again = graft.SparkEntry.queries("c25_source_cap")(spark, dir)
        .collect()
      assert(again.map(_.toString).toSeq == out.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", n0)
  }
}
