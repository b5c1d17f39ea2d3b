package graft

import org.apache.spark.sql.DataFrame

/** Partitioning helpers shared by the compute-bound operators. */
object Par {

  /** Widen an under-partitioned input so a compute-bound stage can use
    * every core.
    *
    * A parquet scan parallelizes by file split, and a split can never be
    * finer than a row-group — so a small table (one row-group) arrives as
    * ONE partition and serializes every expensive per-row expression
    * chained after it (tokenize, lemmatize, shingle+MinHash, similarity
    * self-join). Widening costs a narrow-data shuffle of the raw rows,
    * negligible next to the per-row compute it parallelizes.
    *
    * At real scale the scan already yields >= cores splits and the input
    * passes through untouched — this is a floor, never a cap.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
