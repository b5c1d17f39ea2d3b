package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout.zorder16 bit interleave + Sampling.weightedStratifiedSample
  * (Efraimidis–Spirakis race) — hand-computed bits and invariants.
  */
class LayoutSamplingSpec extends SparkSpec {

  test("zorder16 interleaves bits: x at even, y at odd positions") {
    import spark.implicits._
    val out = Seq((3L, 1L), (0L, 0L), (65535L, 65535L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zorder16($"x", $"y").as("z")).as[Long].collect()
    // x=0b11 -> bits 0,2 = 5; y=0b1 -> bit 1 = 2
    assert(out(0) == 7L)
    assert(out(1) == 0L)
    assert(out(2) == (1L << 32) - 1) // all 32 bits set
    // y-only: every odd bit = 0b1010...10 = 2 * (4^16-1)/3
    assert(out(3) == 2L * (((1L << 32) - 1) / 3))
  }

  test("zorder16 tiles bound both dimensions") {
    import spark.implicits._
    // points in the same 4x4 cell share zval >> 4; distant points don't
    val df = Seq((1L, 2L), (2L, 1L), (1000L, 2000L)).toDF("x", "y")
      .select($"x", $"y", shiftright(Layout.zorder16($"x", $"y"), 4).as("tile"))
      .as[(Long, Long, Long)].collect()
    assert(df(0)._3 == df(1)._3)
    assert(df(0)._3 != df(2)._3)
  }

  test("weighted sample: rank bound, key ordering, and determinism") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, "s" + (i % 3), 10L + i)).toDF("id", "st", "w")
    def run() = Sampling.weightedStratifiedSample(df, "id", "st", $"w", k = 5)
      .select($"st", $"rn", $"id", $"skey")
      .as[(String, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val a = run()
    assert(a.map(_._1).groupBy(identity).values.forall(_.length <= 5))
    a.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        "keys must ascend with rank")
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
    }
    assert(a.toSeq == run().toSeq, "deterministic across runs")
  }

  test("weighted sample: uniform weight rescaling keeps the same winners") {
    import spark.implicits._
    // keys scale by 1/c under w -> c*w, so selection order is invariant
    val base = (1L to 40L).map(i => (i, "a", 5L + (i % 7))).toDF("id", "st", "w")
    val scaled = base.withColumn("w", $"w" * 100L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedStratifiedSample(df, "id", "st", col("w"), 8)
        .orderBy(col("rn")).select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(ids(base) == ids(scaled))
  }

  test("weighted sample favors heavy rows: weight dominates the race") {
    import spark.implicits._
    // one row with overwhelming weight must always be sampled
    val df = ((1L to 30L).map(i => (i, "a", 1L)) :+ ((99L, "a", 1000000L)))
      .toDF("id", "st", "w")
    val picked = Sampling.weightedStratifiedSample(df, "id", "st", $"w", 3)
      .select($"id").as[Long].collect().toSet
    assert(picked.contains(99L))
  }
}
