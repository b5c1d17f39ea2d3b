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
}
