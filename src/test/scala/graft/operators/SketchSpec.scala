package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Fnv

/** HLL sketch: register semantics vs a straight-line JVM mirror, and
  * estimate accuracy against the exact distinct count (the published
  * HLL error bound is 1.04/√m ≈ 13% for m = 64; we assert a generous
  * 3σ envelope).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private val P = 6
  private val M = 1 << P

  /** Reference register computation, straight from the paper. */
  private def referenceRegisters(values: Seq[String]): Array[Int] = {
    val regs = Array.fill(M)(0)
    values.distinct.foreach { v =>
      val h = Fnv.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      val reg = (h & (M - 1)).toInt
      val w = h >>> P
      val rho = if (w == 0) 65 - P
        else java.lang.Long.numberOfTrailingZeros(w) + 1
      regs(reg) = math.max(regs(reg), rho)
    }
    regs
  }

  test("registerTable matches the straight-line reference") {
    val values = (1 to 5000).map(i => s"v${i % 1700}")
    val df = values.map(("g", _)).toDF("grp", "v")
    val got = HllSketch.registerTable(df, "grp", $"v", P)
      .select($"reg", $"maxrho").as[(Int, Int)].collect()
      .sortBy(_._1).map(_._2)
    assert(got.toSeq === referenceRegisters(values).toSeq)
  }

  test("estimate is within the published error bound of the truth") {
    for (n <- Seq(300, 2000, 20000)) {
      val df = (1 to n).map(i => ("g", s"item-$i")).toDF("grp", "v")
      val est = HllSketch.estimates(
        HllSketch.registerTable(df, "grp", $"v", P), P)
        .select($"est").as[Double].head()
      val sigma = 1.04 / math.sqrt(M.toDouble)
      assert(math.abs(est - n) / n <= 3 * sigma,
        s"n=$n est=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("small-range linear counting engages below 2.5m") {
    val df = (1 to 40).map(i => ("g", s"x$i")).toDF("grp", "v")
    val row = HllSketch.estimates(
      HllSketch.registerTable(df, "grp", $"v", P), P)
      .select($"zeros", $"est").as[(Int, Double)].head()
    assert(row._1 > 0) // registers left empty → correction applies
    assert(math.abs(row._2 - 40) <= 12)
  }

  test("registers merge across partitioning layouts (max is assoc/comm)") {
    val values = (1 to 3000).map(i => ("g", s"k${i % 911}"))
    val one = HllSketch.registerTable(
      values.toDF("grp", "v").repartition(1), "grp", $"v", P)
    val many = HllSketch.registerTable(
      values.toDF("grp", "v").repartition(7), "grp", $"v", P)
    assert(one.orderBy("reg").collect().toSeq ===
      many.orderBy("reg").collect().toSeq)
  }

  test("exact percentile tracks approx_percentile (the scale path)") {
    val df = graft.tables.Tables.lineitem(spark, sf("sf0.001"))
    val (exact, approx) = df
      .select(expr("percentile(l_extendedprice, 0.5)"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .as[(Double, Double)].head()
    assert(math.abs(exact - approx) / exact < 0.02)
  }
}
