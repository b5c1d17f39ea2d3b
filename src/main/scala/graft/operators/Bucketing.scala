package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers: pre-shuffle ONCE at write time so repeated
  * equi-joins / aggregations on the bucket key plan with no Exchange at
  * all (SURVEY §4.2; the 100 TB fact-to-fact join path).
  *
  * A fact table that is joined on the same key by many queries (e.g.
  * `lineitem ⋈ orders` on orderkey) pays one hash-partitioned write;
  * every subsequent join reads the co-located layout directly — the
  * shuffle that AQE would otherwise re-run per query disappears from the
  * plan. Buckets are also written pre-sorted (one file per bucket);
  * exploiting that ordering to skip the merge-join sort additionally
  * needs `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
  * (off by default since Spark 3.0 — SPARK-28595).
  */
object Bucketing {

  /** Write `df` as a managed parquet table hash-bucketed (and sorted)
    * on `keys`. Readers get co-located, co-sorted scans via
    * `spark.table(name)`.
    */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
      keys: Seq[String]): Unit =
    // Repartition by the bucket keys FIRST: otherwise every input task
    // writes its own file into every bucket (tasks × buckets small
    // files), and Spark only trusts sortBy metadata when a bucket is a
    // single file — multi-file buckets silently re-Sort in the join.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(name)
}
