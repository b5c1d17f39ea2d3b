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
    *
    * The per-call sort buffers one user's events from ONE micro-batch —
    * bounded by the trigger size in streaming. For a COMPLETE backfill
    * (the whole history arriving as one "batch") use [[sessionizeBatch]]
    * instead, which never materializes a user's history.
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

  /** Batch/backfill sessionization with BOUNDED state: repartition by
    * user, sort within partitions by (user, ts, event_id) — Spark's
    * external sort spills, so a power user's history never has to fit
    * in memory — then ONE incremental pass per partition holding a
    * single open-session record. Bit-equal to
    * `sessionize(_, gapMs, emitOpen = true)` (same per-user event order
    * → same fold; pinned in StreamingSpec), at a fraction of the peak
    * memory: this is the 100 TB replay path, while
    * [[sessionize]] remains the streaming path whose per-call buffer is
    * bounded by the micro-batch.
    */
  def sessionizeBatch(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .repartition(col("user_id"))
      // millisecond key, matching sessionize's (ts.getTime, event_id)
      // fold order exactly (a raw ts sort would tie-break on micros)
      .sortWithinPartitions(col("user_id"), unix_millis(col("ts")),
        col("event_id"))
      .mapPartitions { it =>
        new Iterator[Session] {
          private var cur: Option[(Long, SessionState)] = None // (user, state)
          private var pending: Option[Session] = None
          private def close(u: Long, s: SessionState): Session =
            Session(u, s.start_ms, s.last_ms, s.n, s.sum)
          private def advance(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val e = it.next()
              val t = e.ts.getTime
              cur match {
                case Some((u, s)) if u == e.user_id && t - s.last_ms <= gapMs =>
                  cur = Some((u, s.copy(last_ms = t, n = s.n + 1, sum = s.sum + e.value)))
                case Some((u, s)) =>
                  pending = Some(close(u, s))
                  cur = Some((e.user_id, SessionState(t, t, 1, e.value)))
                case None =>
                  cur = Some((e.user_id, SessionState(t, t, 1, e.value)))
              }
            }
            if (pending.isEmpty && !it.hasNext) { // flush the final session
              pending = cur.map { case (u, s) => close(u, s) }
              cur = None
            }
          }
          override def hasNext: Boolean = {
            if (pending.isEmpty) advance()
            pending.nonEmpty
          }
          override def next(): Session = {
            if (!hasNext) throw new NoSuchElementException
            val out = pending.get
            pending = None
            out
          }
        }
      }
  }
}
