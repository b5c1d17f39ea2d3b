package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing: turn a curated document corpus into the
  * fixed-length training sequences a pretraining run consumes — the
  * "concatenate the token stream, cut every `ctx` tokens" step.
  *
  * Distributed shape (the part that must survive 100 TB):
  *
  *   1. every document is hash-assigned to one of `shards` writer
  *      shards (pure function of its id — reproducible across runs,
  *      engines and re-shards, like the c03 split);
  *   2. within a shard, documents are ordered by the same hash — the
  *      deterministic stand-in for the training shuffle (a real run
  *      wants documents decorrelated from ingest order; a hash order
  *      delivers that without an RNG that can't be replayed);
  *   3. each document's `start_offset` is the EXCLUSIVE running token
  *      count of its shard, and its window is `start_offset div ctx`.
  *
  * One hash shuffle + a per-shard sorted scan: no global sort, no
  * driver state, shards pack independently in parallel. `shards`
  * bounds per-task state, so it scales with the writer fleet (one
  * shard ≈ one output-file writer), not with corpus size.
  */
object Packing {

  /** @param docs     one row per document
    * @param idCol    unique document id (hashed for shard + order)
    * @param nTokens  per-document token count column
    * @param ctx      context window length in tokens
    * @param shards   writer-shard count (power of two — the shard is
    *                 taken from the hash's low bits so an engine
    *                 replaying it with unsigned arithmetic agrees)
    * @return (idCol, shard, n_tokens, start_offset, window_id)
    */
  def contextPack(docs: DataFrame, idCol: String, nTokens: Column,
      ctx: Long, shards: Int): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two, got $shards")
    require(ctx > 0, s"ctx must be positive, got $ctx")
    val h = graft.functions.Fnv.fnv1a64(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("hord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), nTokens.cast("long").as("n_tokens"),
        h.bitwiseAND(lit(shards - 1L)).cast("int").as("shard"),
        h.as("hord"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $ctx").as("window_id"))
  }
}
