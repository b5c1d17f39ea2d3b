package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch properties: mergeability (the 100 TB contract) and the
  * exact-regime estimate.
  */
class ThetaSketchSpec extends SparkSpec {

  test("bottom-k of a union equals bottom-k of per-shard bottom-k's") {
    import spark.implicits._
    val vals = (1 to 500).map(i => ("all", s"v$i"))
    val whole = vals.toDF("grp", "v")
      .withColumn("hu", ThetaSketch.unsignedHash($"v")).select($"grp", $"hu")
    val direct = ThetaSketch.bottomK(whole, "grp", 32)
      .select($"hu").as[java.math.BigDecimal].collect().map(_.toString).sorted

    // 4 shards, sketch each, merge, re-sketch
    val shards = (0 until 4).map { s0 =>
      val shard = vals.filter(_._2.hashCode.abs % 4 == s0).toDF("grp", "v")
        .withColumn("hu", ThetaSketch.unsignedHash($"v"))
        .select($"grp", $"hu")
      ThetaSketch.bottomK(shard, "grp", 32)
    }
    val merged = ThetaSketch.bottomK(
      shards.reduce(_ unionByName _).distinct(), "grp", 32)
      .select($"hu").as[java.math.BigDecimal].collect().map(_.toString).sorted
    assert(direct.toSeq == merged.toSeq)
  }

  test("estimate is close to truth and exact below k is recoverable") {
    import spark.implicits._
    val n = 2000
    val vals = (1 to n).map(i => ("g", s"item-$i")).toDF("grp", "v")
      .withColumn("hu", ThetaSketch.unsignedHash($"v")).select($"grp", $"hu")
    val k = 256
    val sk = ThetaSketch.bottomK(vals, "grp", k)
    val theta = sk.agg(max($"hu").as("theta"))
    val est = theta.select(ThetaSketch.estimate($"theta", k).as("est"))
      .as[Double].head()
    // k=256 -> relative std err ~ 1/sqrt(255) ~ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs $n")
  }
}
