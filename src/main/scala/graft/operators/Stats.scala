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
}
