package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Scale shape: one hash shuffle on the shard key, a spillable external
  * sort within partitions on (shard, hash-order), then ONE linear
  * iterator pass per partition carrying only (shard, pos, seq, used) —
  * the sessionizeBatch pattern. A shard's documents never materialize
  * as a single in-memory array (the r6 `aggregate`-HOF shape built its
  * per-shard assignment with `concat(acc.out, ...)`, an immutable array
  * copy per element = O(n²) per shard; this pass is O(n) and
  * sort-spill-bounded). `shards` scales with the writer fleet; no
  * window over documents, no driver state. A SQL oracle replays the
  * greedy recurrence as a recursive CTE over dense per-shard positions.
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
    val outSchema = StructType(Seq(
      StructField("doc_id", base.schema("doc_id").dataType),
      StructField("shard", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false),
      StructField("seq_id", LongType, nullable = false),
      StructField("nt", LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    base
      .repartition(col("shard"))
      // (hord, doc_id) = the exact order the r6 array_sort(struct(hord,
      // doc_id, nt)) used (doc_id breaks fnv ties); shard leads so the
      // boundary reset below sees each shard contiguously.
      .sortWithinPartitions(col("shard"), col("hord"), col("doc_id"))
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var pos = -1
        var seq = 0L
        var used = 0L
        it.map { r =>
          val sh = r.getInt(2)
          val nt = r.getLong(1)
          if (sh != curShard) {
            curShard = sh; pos = 0; seq = 0L; used = nt
          } else {
            pos += 1
            // greedy: break ONLY when the open sequence has content and
            // no room; an oversized doc on an empty sequence stays alone
            if (used > 0L && used + nt > budget) { seq += 1L; used = nt }
            else used += nt
          }
          Row(r.get(0), sh, pos, seq, nt)
        }
      }
      .toDF()
  }
}
