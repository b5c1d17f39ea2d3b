package graft.io

import org.apache.spark.sql.DataFrame

/** Result sinks (SURVEY §2.1 S5/S6: the engine emits tables, not
  * driver-side prints/charts).
  *
  *  - `writePartitioned`: the corpus-scale layout — hive-style partition
  *    directories so downstream readers get partition pruning for free;
  *  - `writeCsvReport`: one human-readable CSV for small result tables
  *    (the chart-feeding tables of the reference's matplotlib sinks).
  */
object ResultSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def writeCsvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)
}
