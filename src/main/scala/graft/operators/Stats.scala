package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form statistical fits over grouped integer observations
  * (SURVEY §7.5). q26 covers the built-in moment aggregates; this adds
  * the per-group trend fit warehouses run over daily counts.
  */
object Stats {

  /** Per-group ordinary-least-squares line fit over INTEGER (x, y)
    * points: slope and intercept from the closed form
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`.
    *
    * All four moment sums are exact integer aggregations — one hash
    * agg with map-side partial combine, order-independent under any
    * partitioning, bit-identical to any other engine's integer sums.
    * The ONLY float operations are the two final divisions per group
    * (6dp-rounded), so results hash-match across engines — a float
    * `Σxy` would not. Degenerate groups (< 2 distinct x, so zero
    * determinant) yield null slope/intercept rather than ±Inf.
    *
    * Output: (groupCol, n, slope, intercept).
    */
  def olsTrend(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    val d = df.select(col(groupCol), x.cast("long").as("x"),
      y.cast("long").as("y"))
    d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("det", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col(groupCol), col("n"),
        when(col("det") =!= 0L,
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") / col("det"), 6)).as("slope"),
        when(col("det") =!= 0L,
          round((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / col("det"), 6)).as("intercept"))
  }

  /** Per-group Pearson correlation over INTEGER (x, y) observations,
    * from the same exact-moment decomposition as [[olsTrend]]:
    * `r = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))`.
    *
    * The built-in `corr()` accumulates running float co-moments whose
    * value depends on partition merge order; here every Σ is an exact
    * integer hash aggregation and the float math is three IEEE ops per
    * group (two long→double converts stay exact below 2^53, then one
    * multiply / sqrt / divide in a fixed order), so results are
    * bit-stable under any partitioning and hash-match other engines.
    * Zero-variance groups yield null.
    *
    * Output: (groupCol, n, r) with r rounded to 6dp.
    */
  def pearson(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    val d = df.select(col(groupCol), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val m = d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
    m.select(col(groupCol), col("n"),
      when(col("vx") > 0L && col("vy") > 0L,
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(col("vx").cast("double") * col("vy").cast("double")), 6))
        .as("r"))
  }
}
