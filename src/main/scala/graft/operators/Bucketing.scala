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
  * plan. Sorted buckets additionally let sort-merge join skip its sort.
  */
object Bucketing {

  /** Write `df` as a managed parquet table hash-bucketed (and sorted)
    * on `keys`. Readers get co-located, co-sorted scans via
    * `spark.table(name)`.
    */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(name)
}
