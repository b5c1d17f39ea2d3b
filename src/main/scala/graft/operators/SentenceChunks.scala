package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy NO-SPLIT sequence packing: pack whole documents into
  * fixed-budget training sequences without ever cutting a document —
  * the packing regime used when cross-document attention contamination
  * matters (the alternative to [[Packing.contextPack]], which cuts the
  * concatenated token stream mid-document). Documents are hash-ordered
  * within hash shards (the c03/contextPack determinism recipe), then a
  * greedy fold accumulates documents until the next would exceed the
  * budget, starting a new sequence there; an oversized document gets a
  * sequence of its own. What this trades for the no-split guarantee is
  * padding waste — exactly what c20_padding_waste measures.
  *
  * Scale shape: one hash shuffle, then each shard packs independently
  * inside an `aggregate` HOF over its ordered token-count array — the
  * same state a sequence-writer task holds anyway. `shards` scales
  * with the writer fleet, bounding per-task state; no window over
  * documents, no driver state. A SQL oracle replays the greedy fold as
  * a recursive CTE over dense per-shard positions.
  */
object SentenceChunks {

  /** @return one row per document: (doc_id, shard, pos, seq_id, nt) —
    *         pos is the document's dense ordinal in its shard's hash
    *         order, seq_id the training sequence it packs into.
    */
  def noSplitPack(docs: DataFrame, nTokens: org.apache.spark.sql.Column,
      budget: Long, shards: Int): DataFrame = {
    require(shards > 0 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two, got $shards")
    val h = graft.functions.Fnv.fnv1a64(col("doc_id").cast("string"))
    val base = docs.select(col("doc_id"), nTokens.cast("long").as("nt"),
      h.bitwiseAND(lit(shards - 1L)).cast("int").as("shard"), h.as("hord"))
    val packed = base.groupBy(col("shard"))
      .agg(array_sort(collect_list(struct(col("hord"), col("doc_id"),
        col("nt")))).as("ds"))
      .withColumn("seqs", aggregate(
        transform(col("ds"), e => e.getField("nt")),
        struct(lit(0L).as("seq"), lit(0L).as("used"),
          array().cast("array<long>").as("out")),
        (acc, nt) => {
          val over = acc.getField("used") > 0L &&
            acc.getField("used") + nt > budget
          struct(
            when(over, acc.getField("seq") + 1L)
              .otherwise(acc.getField("seq")).as("seq"),
            when(over, nt).otherwise(acc.getField("used") + nt).as("used"),
            concat(acc.getField("out"),
              array(when(over, acc.getField("seq") + 1L)
                .otherwise(acc.getField("seq")))).as("out"))
        },
        acc => acc.getField("out")))
    packed.select(col("shard"),
        posexplode(arrays_zip(col("ds"), col("seqs"))).as(Seq("pos", "z")))
      .select(col("z.ds.doc_id").as("doc_id"), col("shard"),
        col("pos").cast("int").as("pos"), col("z.seqs").as("seq_id"),
        col("z.ds.nt").as("nt"))
  }
}
