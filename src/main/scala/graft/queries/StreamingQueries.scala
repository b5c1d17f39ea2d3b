package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.streaming.EventStreams
import graft.tables.Tables

/** Runs the ACTUAL streaming engine inside the correctness gate: events
  * parquet staged into a directory, consumed via readStream, aggregated
  * with the windowed operator, drained synchronously into a memory sink,
  * and hash-compared against DuckDB's batch equivalent — proving the
  * streaming and batch paths agree (the backfill contract).
  */
object StreamingQueries extends QueryProvider {

  override val all: Seq[Q] = Seq(
    Q(
      "sm01_stream_hourly",
      (s, dir) => {
        import s.implicits._
        val batchSchema = Tables.events(s, dir).schema
        val rawSchema = StructType(batchSchema.map {
          case f if f.name == "ts" => f.copy(dataType = LongType)
          case f => f
        })
        // Unique sink name + staging dir per invocation: two concurrent
        // (or back-to-back) runs in one session must not collide.
        val sink = s"sm01_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm01_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          Files.copy(Paths.get(s"$dir/events.parquet"),
            stage.resolve("events.parquet"))
          val stream = s.readStream.schema(rawSchema).parquet(stage.toString)
            .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          q = EventStreams.windowedCounts(stream, "1 hour")
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          // the memory sink holds the results; drop the staged copy
          Files.deleteIfExists(stage.resolve("events.parquet"))
          Files.deleteIfExists(stage)
        }
        s.table(sink)
          .select($"window_start", $"event_type", $"n",
            round($"sum_value", 2).as("sum_value"))
          .orderBy($"window_start", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |count(*) AS n, round(sum(value),2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin))
  )
}
