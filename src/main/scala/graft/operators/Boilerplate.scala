package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style corpus-frequency boilerplate removal (ref: the dataset-
  * cleaning stage of a pretraining pipeline; the reference corpus has
  * no newlines, so the removal unit is the non-overlapping N-token
  * SEGMENT of the whitespace token stream rather than the line).
  *
  * Scale shape (the part that matters at 100 TB):
  *  1. segmenting is a row-local transform over the scan (no shuffle);
  *  2. the segment-frequency count is ONE partial-aggregated groupBy
  *     whose key space is the segment vocabulary;
  *  3. the surviving "boilerplate dictionary" (segments occurring in
  *     >= minDocs distinct docs) is tiny by construction — high-
  *     frequency boilerplate is a vanishing fraction of distinct
  *     segments — so it is BROADCAST back and the scrub itself is a
  *     narrow map-side left join + re-aggregation keyed on doc_id.
  *
  * The only corpus-wide shuffles are the frequency count and the final
  * per-doc reassembly; both are linear in input size.
  */
object Boilerplate {

  /** Non-overlapping segN-token segments of the whitespace token
    * stream, in document order ("a b c d e", segN=2 → ["a b","c d","e"]).
    */
  def segments(text: Column, segN: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val nSeg = floor((size(toks).cast("double") + (segN - 1)) / segN).cast("int")
    transform(sequence(lit(0), nSeg - 1),
      i => array_join(slice(toks, i * segN + 1, lit(segN)), " "))
  }

  /** Segments occurring in >= minDocs distinct documents — the
    * boilerplate dictionary to scrub.
    */
  def frequentSegments(docs: DataFrame, idCol: String, textCol: String,
      segN: Int, minDocs: Long): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(segments(col(textCol), segN)).as("seg"))
      .groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= minDocs)

  /** Scrub each document: drop its boilerplate segments, keep the rest
    * in order. Returns (doc_id, n_kept, n_dropped, scrubbed_hash) where
    * scrubbed_hash fingerprints the reassembled text (md5 of the
    * space-joined surviving segments) — documents reduced to nothing
    * hash the empty string.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      segN: Int, minDocs: Long): DataFrame = {
    val seg = docs.select(col(idCol).as("doc_id"),
      posexplode(segments(col(textCol), segN)).as(Seq("spos", "seg")))
    val dict = frequentSegments(docs, idCol, textCol, segN, minDocs)
      .select(col("seg"), lit(true).as("boiler"))
    seg.join(broadcast(dict), Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_dropped"),
        md5(array_join(transform(
          array_sort(collect_list(
            when(col("boiler").isNull, struct(col("spos"), col("seg"))))),
          x => x.getField("seg")), " ")).as("scrubbed_hash"))
  }
}
