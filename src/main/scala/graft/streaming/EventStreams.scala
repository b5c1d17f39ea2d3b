package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (SURVEY.md §2.12/§7.5 extension — the reference is batch-only).
  *
  * Both operators take a streaming OR batch DataFrame/Dataset: the same
  * plan serves `readStream` in production and batch parquet in tests —
  * the Structured Streaming contract that makes the 100 TB streaming and
  * backfill paths share code.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Int, sum_value: Double)

  final case class SessionState(start_ms: Long, last_ms: Long,
      n: Int, sum: Double)

  /** Event-time tumbling-window aggregation with a watermark: the
    * streaming form of Relational q12 (hourly type counts).
    */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      // decimal accumulation: micro-batch arrival order cannot perturb
      // the sum by an ulp, so replays and batch backfills are bit-equal
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding (overlapping) windowed counts: each event lands in
    * windowDur/slide windows. Same incremental state-store shape as
    * [[windowedCounts]] — the overlap multiplies state entries, not
    * input passes (the scan stays single).
    */
  def slidingCounts(events: DataFrame, windowDur: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with custom state
    * (KeyValueGroupedDataset.flatMapGroupsWithState): a session closes
    * when the next event for the user arrives more than `gapMs` later.
    *
    * `emitOpen`: in a STREAM the still-open session must stay in state
    * (more events may arrive — default false). In a BATCH backfill there
    * is no later batch, so pass true or every user's final session is
    * silently dropped from the output.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      emitOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last_ms <= gapMs =>
                cur = Some(s.copy(last_ms = t, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                closed += Session(userId, s.start_ms, s.last_ms, s.n, s.sum)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (emitOpen) {
            cur.foreach(s => closed += Session(userId, s.start_ms, s.last_ms, s.n, s.sum))
            state.remove()
          } else {
            cur.foreach(state.update)
          }
          closed.iterator
      }
  }
}
