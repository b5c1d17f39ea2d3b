package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (0L, Seq(1.0, 10.0, 5.0)),
    (1L, Seq(2.0, 10.0, 7.0)),
    (2L, Seq(3.0, 10.0, 9.0))).toDF("id", "vec")

  test("dimStats computes per-dimension moments") {
    val m = EmbeddingStats.dimStats(df, "vec")
      .orderBy($"dim")
      .select($"dim", $"n", $"mean", $"std", $"lo", $"hi")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(m(0) == ((0, 3L, 2.0, math.sqrt(2.0 / 3.0), 1.0, 3.0)))
    assert(m(1) == ((1, 3L, 10.0, 0.0, 10.0, 10.0)))
    assert(m(2)._3 == 7.0)
  }

  test("standardize zero-centers, unit-scales, and zeroes constant dims") {
    val z = EmbeddingStats.standardize(df, "id", "vec")
      .orderBy($"id").as[(Long, Seq[Double])].collect()
    // constant dim 1 -> exactly 0, not NaN
    assert(z.forall(_._2(1) == 0.0))
    // each non-constant dim is zero-mean, unit-variance across rows
    for (d <- Seq(0, 2)) {
      val col = z.map(_._2(d))
      assert(math.abs(col.sum) < 1e-12)
      assert(math.abs(col.map(x => x * x).sum / col.length - 1.0) < 1e-12)
    }
    // order-preserved: row 0 dim 0 is the smallest value -> negative z
    assert(z(0)._2(0) < 0 && z(2)._2(0) > 0)
  }

  test("standardize plan broadcasts the stat row - no shuffle on the vec side") {
    val plan = EmbeddingStats.standardize(df, "id", "vec")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("pca top component recovers a planted direction exactly") {
    // points on the line y = x: centered covariance is [[s,s],[s,s]]
    // with s = 8.75, top eigenpair (λ=17.5, v=(1/√2,1/√2)); the uniform
    // start IS the eigenvector, so one iteration is already exact
    val pts = Seq(
      (0L, Seq(1.0, 1.0)), (1L, Seq(2.0, 2.0)),
      (2L, Seq(3.0, 3.0)), (3L, Seq(-1.0, -1.0))
    ).toDF("id", "vec")
    val out = Pca.topComponent(pts, iters = 3)
      .as[(Int, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, 0.707107, 17.5), (1, 0.707107, 17.5)))
  }
}
