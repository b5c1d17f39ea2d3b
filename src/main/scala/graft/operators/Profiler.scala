package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic one-pass column profiler — the `ANALYZE TABLE`/data-audit
  * shape every ingestion pipeline runs before training: per column, the
  * null count and exact distinct cardinality, plus the table row count.
  *
  * One aggregate over one scan produces every statistic (multiple
  * DISTINCT aggregates plan as a single Expand + two-level hash
  * aggregate — k× row expansion inside the stage, not k passes over
  * storage); the wide 1-row result is then melted to long form with
  * `stack`, a row-local Generate. At 100 TB swap the exact distincts
  * for `approx_count_distinct` — same plan shape minus the Expand
  * blow-up; the gate keeps the exact form so DuckDB can replay it.
  */
object Profiler {

  /** (column, n_rows, n_nulls, n_distinct) per column, ordered by name. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq.sorted
    val aggs =
      count(lit(1)).as("__n") +:
        cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
            count_distinct(col(c)).as(s"__dist_$c"))
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__nulls_$c`, `__dist_$c`").mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)")
      .select(col("column_name"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  /** Equi-width histogram of an integral column: `buckets` buckets over
    * the observed [min, max] in PURE integer arithmetic (width =
    * (max−min) div buckets + 1, bucket = (x−min) div width) — bucket
    * edges are exact however large the values, where float bucketing
    * drifts at the boundaries. The min/max row broadcasts; the
    * histogram itself is one small hash aggregation over a narrow map.
    * Output: (bucket, lo, hi, n) with inclusive [lo, hi] ranges.
    */
  def intHistogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val mm = df.agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
    df.join(broadcast(mm))
      .withColumn("width", expr(s"(mx - mn) div $buckets + 1"))
      .withColumn("bucket", expr(s"(`$c` - mn) div width").cast("int"))
      .groupBy(col("bucket"), col("width"), col("mn"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (col("mn") + col("bucket") * col("width")).as("lo"),
        (col("mn") + (col("bucket") + 1) * col("width") - 1).as("hi"),
        col("n"))
  }
}
