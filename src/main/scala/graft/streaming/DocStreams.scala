package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Document-stream state operators (SURVEY §7.5 streaming extensions).
  *
  * [[bottomKSample]] is the streaming twin of the batch sk10 operator:
  * a per-source uniform sample maintained as stream state. It works
  * BECAUSE bottom-k-by-hash is a mergeable sketch — bottom-k of a
  * union is the bottom-k of the parts — so the state after the last
  * micro-batch equals the batch sample of the full corpus regardless
  * of how the stream was micro-batched or partitioned. That identity
  * is what the gate checks: the streaming snapshot must hash-match the
  * batch oracle exactly.
  */
object DocStreams {

  /** Input row: hv = Fnv.fnv1a_perm(1, doc_id) (signed), computed by
    * the caller so batch and stream share one hash definition.
    */
  final case class DocIn(doc_id: Long, source: String, n_chars: Long,
      hv: Long)

  /** One emitted sample member. `nseen` is the total docs seen for the
    * source so far — strictly increasing, so the snapshot with the max
    * nseen per source is the final state even in an update-mode sink
    * that retains every intermediate emission.
    */
  final case class SampleRow(source: String, nseen: Long, rk: Int,
      doc_id: Long, n_chars: Long)

  /** O(k) state per source: the current bottom-k triples, column-wise
    * (primitive arrays keep the state-store encoding compact).
    */
  final case class BkState(hvs: Array[Long], ids: Array[Long],
      chars: Array[Long], nseen: Long)

  /** Per-source bottom-k-by-hash sample as streaming state. Each
    * micro-batch merges its rows into the ≤k retained triples (ordered
    * by (hv, doc_id) — the same total order the batch operator and the
    * DuckDB oracle use) and re-emits the current sample. State is O(k)
    * per source forever: a 100 TB stream holds 64 triples per source,
    * never the corpus.
    */
  def bottomKSample(docs: Dataset[DocIn], k: Int): Dataset[SampleRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[BkState, SampleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src, it, state) =>
          val prev = state.getOption
            .getOrElse(BkState(Array.empty, Array.empty, Array.empty, 0L))
          val buf =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var i = 0
          while (i < prev.hvs.length) {
            buf += ((prev.hvs(i), prev.ids(i), prev.chars(i))); i += 1
          }
          var added = 0L
          it.foreach { d => buf += ((d.hv, d.doc_id, d.n_chars)); added += 1 }
          val kept = buf.sortBy(t => (t._1, t._2)).take(k)
          val ns = prev.nseen + added
          state.update(BkState(kept.map(_._1).toArray,
            kept.map(_._2).toArray, kept.map(_._3).toArray, ns))
          kept.iterator.zipWithIndex.map { case ((hv, id, ch), idx) =>
            SampleRow(src, ns, idx + 1, id, ch)
          }
      }
  }
}
