package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sampling.sampledTerciles — the a27/a35 CCNet sampled-cutoff route.
  * Pins (a) agreement with the exact rank-rule terciles within bottom-k
  * sampling tolerance, (b) cutoff ordering/monotonicity invariants,
  * (c) stability under repartition (pure function of ids/values).
  */
class CcnetSampledSpec extends SparkSpec {

  // deterministic value spread: multiplicative-congruential noise per id,
  // three groups with very different sizes (sample = whole group for g2)
  private def scored = {
    import spark.implicits._
    (1L to 290L).map { i =>
      val g = if (i <= 200) "g0" else if (i <= 280) "g1" else "g2"
      (i, g, ((i * 2654435761L) % 10007L).toDouble / 100.0)
    }.toDF("doc_id", "lang", "surprisal")
  }

  private def exactBuckets = {
    val w = Window.partitionBy(col("lang")).orderBy(col("surprisal"), col("doc_id"))
    val n = Window.partitionBy(col("lang"))
    scored
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .withColumn("exact",
        when((col("rk") - 1) * 3 < (col("n") - 1), "head")
          .when((col("rk") - 1) * 3 < (col("n") - 1) * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("exact"))
  }

  test("sampled buckets agree with exact terciles within sampling tolerance") {
    import spark.implicits._
    val samp = Sampling.sampledTerciles(scored, "doc_id", "lang", "surprisal", 64)
    val joined = samp.join(exactBuckets, "doc_id")
      .select($"lang", ($"bucket" === $"exact").as("ok"))
      .as[(String, Boolean)].collect()
    assert(joined.length == 290)
    val agree = joined.count(_._2).toDouble / joined.length
    assert(agree >= 0.90, f"per-doc bucket agreement $agree%.3f < 0.90")
    // the fully-sampled group (10 < k rows) can only disagree on the
    // rank-vs-value tie rule, never by sampling error: demand >= 80%
    val g2 = joined.filter(_._1 == "g2")
    assert(g2.count(_._2).toDouble / g2.length >= 0.8)
  }

  test("cutoffs are ordered and buckets respect them exactly") {
    import spark.implicits._
    val rows = Sampling.sampledTerciles(scored, "doc_id", "lang", "surprisal", 64)
      .select($"lang", $"surprisal", $"cut_head", $"cut_middle", $"bucket")
      .as[(String, Double, Double, Double, String)].collect()
    rows.foreach { case (g, v, c1, c2, b) =>
      assert(c1 <= c2, s"$g cutoffs out of order: $c1 > $c2")
      val expect = if (v <= c1) "head" else if (v <= c2) "middle" else "tail"
      assert(b == expect, s"$g v=$v c1=$c1 c2=$c2 got $b")
    }
    // all three buckets materialize in the big groups
    val perG = rows.groupBy(_._1).view.mapValues(_.map(_._5).distinct.toSet)
    assert(perG("g0") == Set("head", "middle", "tail"))
    assert(perG("g1") == Set("head", "middle", "tail"))
  }

  test("assignment is a pure function of (id, value): stable under repartition") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampledTerciles(df, "doc_id", "lang", "surprisal", 64)
        .select(col("doc_id"), col("bucket"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(scored) == run(scored.repartition(7)))
  }
}
