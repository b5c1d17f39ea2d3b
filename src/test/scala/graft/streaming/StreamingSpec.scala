package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts over a MemoryStream match the batch equivalent") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[EventStreams.Event]
    val events = (0 until 100).map { i =>
      EventStreams.Event(i, new Timestamp(1700000000000L + i * 60000L),
        i % 5, if (i % 2 == 0) "click" else "view", i.toDouble)
    }
    src.addData(events: _*)
    val q = EventStreams.windowedCounts(src.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("wincounts").start()
    q.processAllAvailable()
    q.stop()
    // sum_value accumulates in decimal(18,6): compare both sides after
    // the same round-and-cast the gate queries apply
    val streamed = spark.table("wincounts")
      .select($"window_start", $"event_type", $"n",
        round($"sum_value", 2).cast("double").as("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val batch = EventStreams.windowedCounts(events.toDF())
      .select($"window_start", $"event_type", $"n",
        round($"sum_value", 2).cast("double").as("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("append mode emits closed windows once and drops data later than the watermark") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[EventStreams.Event]
    val base = 1700002800000L // hour-aligned, so minutes 0-59 share a window
    assert(base % 3600000L == 0)
    def ev(id: Long, tMin: Long) = EventStreams.Event(
      id, new Timestamp(base + tMin * 60000L), 1L, "click", 1.0)
    val sink = s"latewin_${System.nanoTime}"
    val q = EventStreams.windowedCounts(src.toDF(),
      windowDur = "1 hour", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: three events inside hour 0
      src.addData(ev(1, 0), ev(2, 10), ev(3, 50))
      q.processAllAvailable()
      // batch 2: event far in the future advances the watermark past
      // hour 0's end -> hour 0's window becomes final and is emitted
      src.addData(ev(4, 300))
      q.processAllAvailable()
      val afterClose = spark.table(sink)
        .select($"window_start", $"n").as[(Timestamp, Long)].collect().toMap
      assert(afterClose == Map(new Timestamp(base) -> 3L),
        s"expected the closed hour-0 window with all 3 events: $afterClose")
      // batch 3: a LATE event back in hour 0, far behind the watermark —
      // state is gone, append mode must not re-emit or grow the window
      src.addData(ev(5, 20))
      q.processAllAvailable()
      val afterLate = spark.table(sink)
        .select($"window_start", $"n").as[(Timestamp, Long)].collect().toMap
      assert(afterLate == afterClose,
        s"late event changed emitted output: $afterLate vs $afterClose")
    } finally q.stop()
  }

  test("file-source streaming from the harness events parquet") {
    val batch = Tables.events(spark, sf("sf0.001"))
    // same probe + normalization contract as the production queries:
    // handles both annotated-µs and raw-nanos harness generations
    val fileSchema = Tables.eventsFileSchema(spark, sf("sf0.001"))
    // FileStreamSource wants a directory: stage the file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${sf("sf0.001")}/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(fileSchema).parquet(dir.toString))
    val q = EventStreams.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("filewin").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("filewin").count()
    val expected = EventStreams.windowedCounts(batch).count()
    assert(streamed == expected)
  }

  test("batch sessionize with emitOpen flushes every user's final session") {
    def ev(id: Long, tMs: Long, user: Long) =
      EventStreams.Event(id, new Timestamp(tMs), user, "click", 1.0)
    val batch = Seq(
      ev(1, 0, 1), ev(2, 30000, 1), ev(3, 600000, 1), // 2 sessions for user 1
      ev(4, 0, 2)).toDS()
    val out = EventStreams.sessionize(batch, gapMs = 60000, emitOpen = true)
      .collect().sortBy(s => (s.user_id, s.start_ms))
    assert(out.length == 3) // both user-1 sessions AND user-2's open one
    assert(out.map(_.n_events).toSeq == Seq(2, 1, 1))
  }

  test("sessionization closes sessions on gaps, keeps state across batches") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[EventStreams.Event]
    def ev(id: Long, tMs: Long, user: Long) =
      EventStreams.Event(id, new Timestamp(tMs), user, "click", 1.0)
    // batch 1: user 1 events at t=0s,30s; user 2 at t=0s
    src.addData(ev(1, 0, 1), ev(2, 30000, 1), ev(3, 0, 2))
    val q = EventStreams.sessionize(src.toDS(), gapMs = 60000)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // nothing closed yet
    // batch 2: user 1 event 10 min later -> closes first session (2 events)
    src.addData(ev(4, 600000, 1))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions")
      .as[EventStreams.Session].collect()
    assert(closed.length == 1)
    assert(closed.head.user_id == 1 && closed.head.n_events == 2)
    assert(closed.head.start_ms == 0 && closed.head.end_ms == 30000)
  }

  test("sessionizeBatch equals the stateful sessionizer, including one giant group") {
    // one power user with a long history dwarfing everyone else — the
    // skew shape the bounded-state path exists for
    def ev(id: Long, tMs: Long, user: Long, v: Double) =
      EventStreams.Event(id, new Timestamp(tMs), user, "click", v)
    val skewed = (0 until 5000).map(i =>
        ev(i.toLong, i.toLong * 45000, 1L, i * 0.001)) ++ // gaps every step < 60s
      Seq(ev(9001, 0, 2, 1.0), ev(9002, 1000000, 2, 2.0), ev(9003, 100, 3, 0.5))
    val ds = skewed.toDS().repartition(7)
    val viaState = EventStreams.sessionize(ds, gapMs = 60000, emitOpen = true)
      .collect().map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaBatch = EventStreams.sessionizeBatch(ds, gapMs = 60000)
      .collect().map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaBatch == viaState) // bit-equal, sums included
    assert(viaBatch.count(_._1 == 1L) == 1 && viaBatch.head._4 == 5000)
  }

  test("sessionizeBatch matches the harness-events stateful path") {
    val events = Tables.events(spark, sf("sf0.001")).as[EventStreams.Event]
    val viaState = EventStreams.sessionize(events, 3600000L, emitOpen = true)
      .collect().map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      .sortBy(t => (t._1, t._2)).toSeq
    val viaBatch = EventStreams.sessionizeBatch(events, 3600000L)
      .collect().map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(viaBatch == viaState)
    assert(viaBatch.nonEmpty)
  }

  test("sm02 gate query (streamed sessions) equals the batch sessionizer") {
    val sm02 = graft.queries.StreamingQueries.all
      .find(_.name == "sm02_stream_sessions").get
    val streamed = sm02.run(spark, sf("sf0.001"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val batch = EventStreams.sessionize(
        Tables.events(spark, sf("sf0.001")).as[EventStreams.Event],
        gapMs = 3600L * 1000, emitOpen = true)
      .collect()
      .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events.toLong,
        BigDecimal(s.sum_value).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
