package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._


import graft.streaming.EventStreams
import graft.tables.Tables

/** Runs the ACTUAL streaming engine inside the correctness gate: events
  * parquet staged into a directory, consumed via readStream, aggregated
  * with the windowed operator, drained synchronously into a memory sink,
  * and hash-compared against DuckDB's batch equivalent — proving the
  * streaming and batch paths agree (the backfill contract).
  */
object StreamingQueries extends QueryProvider {

  /** Stage a source table for readStream. The driver's sf dirs hold one
    * parquet FILE per table, but Spark-written replicas (the Stress sf1
    * dir) hold a DIRECTORY of part files — a plain `Files.copy` of a
    * directory stages it EMPTY, silently turning the streamed corpus
    * into zero rows. Copy whichever layout is present as flat files.
    */
  private def stageParquet(src: String, stage: java.nio.file.Path,
      name: String): Unit = {
    val p = Paths.get(src)
    if (Files.isDirectory(p)) {
      new java.io.File(src).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) =>
          Files.copy(f.toPath, stage.resolve(f"${name}_$i%05d.parquet")): Unit
        }
    } else Files.copy(p, stage.resolve(s"$name.parquet")): Unit
  }

  /** Remove a [[stageParquet]] stage dir (flat files only). */
  private def rmStage(stage: java.nio.file.Path): Unit = {
    Option(stage.toFile.listFiles()).foreach(_.foreach(f => f.delete(): Unit))
    Files.deleteIfExists(stage): Unit
  }

  override val all: Seq[Q] = Seq(
    Q(
      "sm01_stream_hourly",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        // Unique sink name + staging dir per invocation: two concurrent
        // (or back-to-back) runs in one session must not collide.
        val sink = s"sm01_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm01_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = EventStreams.windowedCounts(stream, "1 hour")
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          // the memory sink holds the results; drop the staged copy
          rmStage(stage)
        }
        s.table(sink)
          .select($"window_start", $"event_type", $"n",
            round($"sum_value", 2).cast("double").as("sum_value"))
          .orderBy($"window_start", $"event_type")
      },
      // decimal accumulation mirrored oracle-side (sm06 pattern): both
      // engines round the EXACT sum, so near-tie groups can't diverge
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |count(*) AS n,
             |CAST(round(sum(CAST(value AS DECIMAL(18,6))),2) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // Gap-based sessionization through the REAL streaming path:
    // readStream → flatMapGroupsWithState (custom state) → memory sink,
    // hash-compared against DuckDB's batch gaps-and-islands equivalent
    // (lag → break marks → running-sum island ids → per-island agg).
    // emitOpen=true: this is the batch-complete backfill contract — no
    // later micro-batch exists, so still-open sessions must flush.
    Q(
      "sm02_stream_sessions",
      (s, dir) => {
        import s.implicits._
        val gapMs = 3600L * 1000 // 1 hour
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm02_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm02_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
            .as[EventStreams.Event]
          q = EventStreams.sessionize(stream, gapMs, emitOpen = true)
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .select($"user_id", $"start_ms", $"end_ms",
            $"n_events".cast("long").as("n_events"),
            round($"sum_value", 2).as("sum_value"))
          .orderBy($"user_id", $"start_ms")
      },
      Some("""WITH marks AS (
             |  SELECT user_id, event_id, epoch_ms(ts) AS t, value,
             |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id) > 3600000
             |    THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |isl AS (
             |  SELECT user_id, t, value,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marks)
             |SELECT user_id, min(t) AS start_ms, max(t) AS end_ms,
             |count(*) AS n_events, round(sum(value),2) AS sum_value
             |FROM isl GROUP BY user_id, sid
             |ORDER BY user_id, start_ms""".stripMargin)),

    // Streaming exact dedup — the training-pipeline shape (a document
    // stream deduplicated by content hash as it lands) through the REAL
    // `dropDuplicates` state store. Output is the distinct hash set
    // (key-only, so which physical copy arrived first cannot perturb
    // the result), hash-compared against batch DISTINCT — the
    // stream/batch backfill contract for dedup. At corpus scale the
    // same plan takes a `withWatermark` to bound state; the gate replay
    // is batch-complete so none is needed here.
    Q(
      "sm03_stream_dedup",
      (s, dir) => {
        import s.implicits._
        val sink = s"sm03_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm03_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val schema = Tables.documents(s, dir).schema
          val stream = s.readStream.schema(schema).parquet(stage.toString)
          q = stream
            .select(md5(graft.operators.Dedup.normalized($"text")).as("content_hash"))
            .dropDuplicates("content_hash")
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink).select($"content_hash").orderBy($"content_hash")
      },
      Some("""SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
             |FROM documents ORDER BY content_hash""".stripMargin)),

    // Stream-STREAM inner join (state on both sides — the capability
    // windowed aggregation and dedup don't exercise): every click
    // paired with the same user's purchases in the preceding hour. Both
    // branches carry watermarks so the join state is bounded by the
    // time-range condition (the production shape); inner-join matches
    // emit without waiting for the watermark, so the batch-complete
    // replay is deterministic and equals the batch join the oracle
    // states directly.
    Q(
      "sm04_stream_join",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm04_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm04_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          val clicks = stream.filter($"event_type" === "click")
            .select($"event_id".as("click_id"), $"user_id".as("cu"),
              $"ts".as("cts"))
            .withWatermark("cts", "2 hours")
          val purchases = stream.filter($"event_type" === "purchase")
            .select($"event_id".as("purchase_id"), $"user_id".as("pu"),
              $"ts".as("pts"))
            .withWatermark("pts", "2 hours")
          q = clicks.join(purchases,
              $"pu" === $"cu" &&
                $"pts" >= $"cts" - expr("INTERVAL 1 HOUR") &&
                $"pts" <= $"cts")
            .select($"click_id", $"purchase_id")
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink).select($"click_id", $"purchase_id")
          .orderBy($"click_id", $"purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id
             |FROM events c JOIN events p
             |  ON p.user_id = c.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // SLIDING (overlapping) windows through the real streaming path:
    // 1-hour windows every 15 minutes, so each event feeds 4 windows.
    // The overlap multiplies STATE ENTRIES (4× here), never input
    // passes — the scan stays single at any rate. Oracle replays the
    // fan-out relationally: each event joins to its 4 epoch-aligned
    // window starts (Spark's window() aligns to the epoch; 15-minute
    // buckets make day-offset origins equivalent).
    Q(
      "sm05_stream_sliding",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm05_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm05_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = EventStreams.slidingCounts(stream, "1 hour", "15 minutes")
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .select($"window_start", $"event_type", $"n",
            round($"sum_value", 2).cast("double").as("sum_value"))
          .orderBy($"window_start", $"event_type")
      },
      Some("""WITH e AS (SELECT event_type, value,
             |  time_bucket(INTERVAL '15 minutes', ts) AS t0 FROM events),
             |x AS (SELECT event_type, value,
             |  t0 - unnest(range(4)) * INTERVAL '15 minutes' AS window_start
             |  FROM e)
             |SELECT window_start, event_type, count(*) AS n,
             |CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
             |FROM x GROUP BY window_start, event_type
             |ORDER BY window_start, event_type""".stripMargin)),

    // The PRODUCTION sink shape: update-mode aggregation drained through
    // foreachBatch into an upserted parquet table across MULTIPLE
    // micro-batches (events staged as three files, maxFilesPerTrigger=1
    // → three genuine incremental batches; each upsert = anti-join out
    // the updated keys, append the new values, atomic directory swap —
    // the filesystem stand-in for a Delta/Iceberg MERGE). Value sums
    // accumulate in DECIMAL so cross-batch arrival order cannot perturb
    // a single bit; the final upserted table must equal the batch
    // aggregate, which is the oracle.
    Q(
      "sm06_stream_upsert",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val stage = Files.createTempDirectory("sm06_events")
        val sinkRoot = Files.createTempDirectory("sm06_sink")
        val dataDir = sinkRoot.resolve("data").toString
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          // three deterministic slices → three micro-batches
          (0 until 3).foreach { i =>
            val tmp = sinkRoot.resolve(s"slice$i").toString
            s.read.schema(fileSchema).parquet(s"$dir/events.parquet")
              .filter($"event_id" % 3 === i)
              .coalesce(1).write.mode("overwrite").parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            Files.copy(part.toPath, stage.resolve(f"events_$i%02d.parquet"))
          }
          val stream = s.readStream.schema(fileSchema)
            .option("maxFilesPerTrigger", "1").parquet(stage.toString)
          val agg = stream.groupBy($"user_id")
            .agg(count(lit(1)).as("n_events"),
              sum($"value".cast("decimal(18,6)")).as("sum_value"))
          q = agg.writeStream.outputMode("update")
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              val sp = batch.sparkSession
              val cur = new java.io.File(dataDir)
              val next =
                if (cur.exists())
                  sp.read.parquet(dataDir)
                    .join(batch, Seq("user_id"), "left_anti")
                    .unionByName(batch)
                else batch
              val tmpOut = s"$dataDir.next"
              next.write.mode("overwrite").parquet(tmpOut)
              // atomic-ish swap: the writer is the only reader between batches
              def rmRec(f: java.io.File): Unit = {
                if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
                f.delete(): Unit
              }
              rmRec(cur)
              Files.move(Paths.get(tmpOut), Paths.get(dataDir)): Unit
            }
            .start()
          q.processAllAvailable()
          s.read.parquet(dataDir)
            .select($"user_id", $"n_events",
              round($"sum_value", 2).cast("double").as("sum_value"))
            .orderBy($"user_id")
            .localCheckpoint()
        } finally {
          if (q != null) q.stop()
          def rmRec(f: java.io.File): Unit = {
            if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
            f.delete(): Unit
          }
          rmRec(stage.toFile)
          rmRec(sinkRoot.toFile)
        }
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // WATERMARK LATE-DROP — the semantic that separates streaming from
    // batch, pinned cross-engine. Three real micro-batches in mod-time
    // order (maxFilesPerTrigger=1): A = pre-cutoff events minus a 10%
    // "delayed" slice; B = the post-cutoff events (these advance the
    // watermark to max(ts_A∪B) − 2 h and EVICT the closed windows at
    // batch end); C = the delayed slice, arriving AFTER its windows
    // were evicted — dropped by the watermark, except stragglers whose
    // window still ends above the batch-B-operative watermark
    // max(ts_A) − 2 h (eviction always runs after the batch's input is
    // merged, so a late row is only lost once a PRIOR batch closed its
    // window — the exact contract this query pins). The oracle replays
    // the watermark arithmetic — millisecond floor (Spark tracks
    // event-time stats in ms), per-batch eviction cut, straggler keep
    // predicate — relationally.
    Q(
      "sm07_stream_late_drop",
      (s, dir) => {
        import s.implicits._
        // Slice on the NORMALIZED (TimestampType, UTC session) events so
        // the staged batches carry an annotated-µs ts the stream reads
        // back without any unit conversion.
        val events = Tables.events(s, dir)
        val normSchema = events.schema
        // wall-clock cutoff; session zone is pinned UTC so this matches
        // the oracle's naive TIMESTAMP '2024-01-20 00:00:00'
        val cutoff = to_timestamp(lit("2024-01-20 00:00:00"))
        val sink = s"sm07_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm07_events")
        val scratch = Files.createTempDirectory("sm07_scratch")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        def rmRec(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
          f.delete(): Unit
        }
        try {
          val isEarly = $"ts" < cutoff
          val slices = Seq(
            events.filter(isEarly && $"event_id" % 10 =!= 0),
            events.filter(!isEarly),
            events.filter(isEarly && $"event_id" % 10 === 0))
          slices.zipWithIndex.foreach { case (df, i) =>
            val tmp = scratch.resolve(s"w$i").toString
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            val dst = stage.resolve(f"batch_$i%02d.parquet")
            Files.move(part.toPath, dst)
            // distinct mod times pin the micro-batch order
            dst.toFile.setLastModified(1000000000000L + i * 60000L): Unit
          }
          val stream = s.readStream.schema(normSchema)
            .option("maxFilesPerTrigger", "1").parquet(stage.toString)
            .withWatermark("ts", "2 hours")
            .filter($"event_type" =!= "__flush")
          q = stream
            .groupBy(window($"ts", "1 hour"))
            .agg(count(lit(1)).as("n"),
              sum($"value".cast("decimal(18,6)")).as("sv"))
            .select($"window.start".as("window_start"), $"n",
              round($"sv", 2).cast("double").as("sum_value"))
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmRec(stage.toFile)
          rmRec(scratch.toFile)
        }
        s.table(sink).select($"window_start", $"n", $"sum_value")
          .orderBy($"window_start")
          .localCheckpoint()
      },
      Some("""WITH a AS (SELECT * FROM events
             |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00' AND event_id % 10 <> 0),
             |b AS (SELECT * FROM events
             |  WHERE NOT (ts < TIMESTAMP '2024-01-20 00:00:00' AND event_id % 10 <> 0)),
             |w1 AS (SELECT (epoch_us(max(ts)) // 1000) * 1000 - 7200000000 AS w FROM a),
             |w2 AS (SELECT (epoch_us(max(ts)) // 1000) * 1000 - 7200000000 AS w
             |  FROM events),
             |kept AS (SELECT ts, value FROM a
             |  UNION ALL
             |  SELECT b.ts, b.value FROM b CROSS JOIN w1
             |  WHERE epoch_us(date_trunc('hour', b.ts) + INTERVAL 1 HOUR) > w1.w),
             |agg AS (SELECT date_trunc('hour', ts) AS window_start, count(*) AS n,
             |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
             |  FROM kept GROUP BY 1)
             |SELECT window_start, n, sum_value FROM agg CROSS JOIN w2
             |WHERE epoch_us(window_start + INTERVAL 1 HOUR) <= w2.w
             |ORDER BY window_start""".stripMargin)),

    // Ingest-time curation through the REAL streaming path: the
    // quality-score + language-verification gate (the c01 front half)
    // applied to a document STREAM in append mode. The operators are
    // stateless narrow expressions, so the streaming plan is the batch
    // plan — this gate pins that a corpus curated on arrival equals
    // one curated in backfill (no watermark, no state store involved).
    Q(
      "sm08_stream_curation",
      (s, dir) => {
        import s.implicits._
        import graft.operators.{TextAnalysis => TA}
        import graft.text.{TextFunctions => TF}
        val batchSchema = Tables.documents(s, dir).schema
        val sink = s"sm08_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm08_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(batchSchema)
            .parquet(stage.toString)
          val tok = TF.tokenize($"text")
          q = stream
            .select($"doc_id", $"lang",
              round(TA.qualityScore($"text", tok), 6).as("quality"),
              TA.languageId($"text").as("guessed"))
            .filter($"quality" >= 0.5 && $"guessed" === $"lang")
            .select($"doc_id", $"lang", $"quality")
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink).orderBy($"doc_id").localCheckpoint()
      },
      Some(
        s"""WITH base AS (SELECT doc_id, lang, text,
           |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok,
           |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk FROM documents),
           |m AS (SELECT *,
           |  ${TextSql.ratioItems}
           |  FROM base),
           |q AS (SELECT doc_id, lang, text, tk,
           |  ${TextSql.qualityExpr("len(tok)")} AS quality
           |  FROM m),
           |v AS (SELECT *,
           |  ${TextSql.voteItems}
           |  FROM q),
           |g AS (SELECT *,
           |  ${TextSql.guessedCase} AS guessed
           |  FROM v)
           |SELECT doc_id, lang, quality FROM g
           |WHERE quality >= 0.5 AND guessed = lang
           |ORDER BY doc_id""".stripMargin)),

    // Stream-STATIC enrichment — the most common production streaming
    // join: each arriving event looks up a slowly-changing dimension
    // (per-user value tier, precomputed in batch) via a BROADCAST join
    // — stateless on the stream side, so no watermark and no join
    // state; the dim refreshes per micro-batch at no extra shuffle.
    // Oracle replays the dim derivation + the enriched rollup in one
    // batch plan (the backfill contract again).
    Q(
      "sm09_stream_enrich",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        // static dim from the batch table: user -> value tier by the
        // global median of per-user totals (exact percentile)
        val totals = Tables.events(s, dir)
          .groupBy($"user_id").agg(round(sum($"value"), 6).as("tot"))
        val med = totals.agg(round(expr("percentile(tot, 0.5)"), 6).as("m"))
        val dim = totals.crossJoin(broadcast(med))
          .select($"user_id",
            when($"tot" >= $"m", "high").otherwise("low").as("tier"))
        val sink = s"sm09_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm09_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = stream.join(broadcast(dim), Seq("user_id"))
            .groupBy($"tier", $"event_type")
            .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .select($"tier", $"event_type", $"n",
            round($"sv", 2).as("sum_value"))
          .orderBy($"tier", $"event_type")
      },
      Some("""WITH t AS (SELECT user_id, round(sum(value), 6) AS tot
             |  FROM events GROUP BY user_id),
             |m AS (SELECT round(quantile_cont(tot, 0.5), 6) AS m FROM t),
             |d AS (SELECT user_id,
             |  CASE WHEN tot >= m THEN 'high' ELSE 'low' END AS tier
             |  FROM t, m)
             |SELECT tier, event_type, count(*) AS n,
             |  round(sum(value), 2) AS sum_value
             |FROM events JOIN d USING (user_id)
             |GROUP BY tier, event_type ORDER BY tier, event_type""".stripMargin)),

    // Streaming heavy-hitters: the hourly windowed counts maintained by
    // the REAL streaming engine, ranked to per-window top-3 event types
    // downstream of the sink (rank-over-complete-output is the standard
    // topology — the stream maintains the additive state, the consumer
    // ranks the tiny aggregated table). Oracle is the batch equivalent.
    Q(
      "sm10_stream_topk",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm10_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm10_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = EventStreams.windowedCounts(stream, "1 hour")
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"window_start").orderBy(desc("n"), $"event_type")
        s.table(sink)
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"window_start", $"rnk".cast("long").as("rnk"),
            $"event_type", $"n")
          .orderBy($"window_start", $"rnk")
      },
      Some("""WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
             |  event_type, count(*) AS n FROM events GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY window_start
             |  ORDER BY n DESC, event_type) AS rnk FROM c)
             |SELECT window_start, CAST(rnk AS BIGINT) AS rnk, event_type, n
             |FROM r WHERE rnk <= 3 ORDER BY window_start, rnk""".stripMargin)),

    // Spark's NATIVE session_window through the REAL streaming engine —
    // the engine-managed merging-interval state q51 runs in batch, here
    // driven by the session-window state store. Session windows only
    // support APPEND mode (sessions emit once their end falls behind
    // the watermark), so the replay stages TWO micro-batches (sm07's
    // pattern): batch A = all real events; batch B = one far-future
    // `__flush` row that advances the watermark past every real
    // session's end (the row itself is filtered out after the watermark
    // node, so it feeds the clock, never the aggregation). The final
    // emitted set is then the complete session table, which equals the
    // batch aggregate — the same stream-equals-backfill contract as
    // sm01, for the operator class sm02 implements by hand.
    Q(
      "sm11_stream_session_window",
      (s, dir) => {
        import s.implicits._
        val events = Tables.events(s, dir)
        val normSchema = events.schema
        val sink = s"sm11_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm11_events")
        val scratch = Files.createTempDirectory("sm11_scratch")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        def rmRec(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
          f.delete(): Unit
        }
        try {
          // TWO flush batches: eviction uses the watermark computed at
          // the END of the PRIOR batch (sm07's pinned semantics), so
          // batch B emits everything older than maxA − 2 h and batch C
          // (watermark now 2099-01-01 − 2 h) emits the tail sessions.
          // The flush rows ride a sentinel user (-1) THROUGH the
          // aggregation — a filter between watermark and groupBy gets
          // pushed below the watermark node, and a row that never
          // reaches the event-time stats never advances the clock; the
          // sentinel's own sessions are dropped at the sink instead.
          def flush(ts: String) = events.limit(1)
            .withColumn("ts", to_timestamp(lit(ts)))
            .withColumn("user_id", lit(-1L))
            .withColumn("value", lit(0.0))
          Seq(events, flush("2099-01-01 00:00:00"), flush("2099-02-01 00:00:00"))
            .zipWithIndex.foreach { case (df, i) =>
            val tmp = scratch.resolve(s"w$i").toString
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            val part = new java.io.File(tmp).listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            val dst = stage.resolve(f"batch_$i%02d.parquet")
            Files.move(part.toPath, dst)
            dst.toFile.setLastModified(1000000000000L + i * 60000L): Unit
          }
          q = s.readStream.schema(normSchema)
            .option("maxFilesPerTrigger", "1").parquet(stage.toString)
            .withWatermark("ts", "2 hours")
            .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
            .agg(count(lit(1)).as("n_events"),
              sum($"value".cast("decimal(18,6)")).as("sv"))
            .select($"user_id",
              unix_micros($"w.start").as("start_us"),
              unix_micros($"w.end").as("end_us"),
              $"n_events",
              round($"sv", 2).cast("double").as("sum_value"))
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmRec(stage.toFile)
          rmRec(scratch.toFile)
        }
        s.table(sink)
          .filter($"user_id" >= 0) // drop the sentinel flush sessions
          .select($"user_id", $"start_us", $"end_us", $"n_events", $"sum_value")
          .orderBy($"user_id", $"start_us")
      },
      Some(TemporalQueries.sessionWindowOracle)),

    // The state-BOUNDED form of sm03's streaming dedup:
    // dropDuplicatesWithinWatermark keeps a key in the state store only
    // until the watermark passes its event time — the production shape
    // for an infinite stream, where sm03's dropDuplicates would grow
    // state forever (exactly the caveat documented on sm03). The gate
    // replay is batch-complete (one micro-batch, watermark still at
    // epoch), so no key evicts mid-replay and the emitted key set
    // equals batch DISTINCT — which is the oracle. Only the KEYS are
    // emitted: which physical copy survives depends on intra-batch
    // arrival order, so the row payload is not part of the contract.
    Q(
      "sm12_stream_dedup_watermark",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm12_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm12_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = stream
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark("user_id", "event_type")
            .select($"user_id", $"event_type")
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink).select($"user_id", $"event_type")
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),

    // Streaming near-dup INDEX maintenance: documents arrive as a
    // stream, each is shingled/minhashed with the exact d04 pipeline
    // (FNV family — oracle-replayable), and the stateful aggregation
    // maintains the LSH band index incrementally — per (band, key)
    // bucket: the canonical (minimum) doc id and the member count. A
    // streaming ingest pipeline serves near-dup candidate lookups from
    // exactly this index (new doc → 8 bucket probes), and min/count are
    // order-independent aggregates, so the maintained index is
    // DETERMINISTIC regardless of arrival order — which is what makes
    // this streamable where "keep the first arrival" near-dup is not.
    // At scale the same plan runs in update mode into a KV sink; the
    // gate drains it complete into a memory sink and keeps only the
    // collision buckets.
    Q(
      "sm13_stream_lsh_index",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Dedup
        import graft.text.{TextFunctions => TF}
        // schema from the batch loader (as sm03 does) — a hardcoded
        // StructType would silently NULL-out renamed/retyped columns
        val docSchema = Tables.documents(s, dir).schema
        val sink = s"sm13_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm13_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(docSchema).parquet(stage.toString)
          val sigs = stream
            .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
            .where(size($"tokens") >= 3)
            .select($"id", Dedup.minhashSignature(
              Dedup.shingleHashes(Dedup.shingles($"tokens", 3)), 32).as("sig"))
          val banded = sigs.select($"id",
            posexplode(Dedup.bandKeyArray($"sig", bands = 8, rowsPerBand = 4)))
            .toDF("id", "band", "key")
          q = banded
            .groupBy($"band", $"key")
            .agg(min($"id").as("canonical"), count(lit(1)).as("n_docs"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .filter($"n_docs" > 1)
          .select($"band".cast("long").as("band"), $"key",
            $"canonical", $"n_docs")
          .orderBy($"band", $"key")
      },
      // d04's minhash CTE chain, read at the `bands` stage: the index
      // contents must equal the batch banding of the same corpus.
      Some(s"""WITH ${DedupQueries.minhashBandCtes}
              |SELECT CAST(band AS BIGINT) AS band, key,
              |  min(id) AS canonical, count(*) AS n_docs
              |FROM bands GROUP BY band, key HAVING count(*) > 1
              |ORDER BY band, key""".stripMargin)),

    // Streaming drift monitor: the hourly event-type mix maintained by
    // the REAL streaming engine (windowedCounts' additive state), PSI-
    // scored per window against the global batch reference mix
    // DOWNSTREAM of the sink — the monitoring topology where the
    // stream maintains only the tiny additive aggregate and the
    // consumer computes the drift score over it (a17's batch PSI, e07's
    // drift idea, on the stream path). Smoothed +0.5 window counts
    // keep absent types finite; per-type terms round to 9dp and sum in
    // a sorted fold so neither engine's addition order can leak in.
    Q(
      "sm14_stream_drift",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm14_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm14_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = EventStreams.windowedCounts(stream, "1 hour")
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        // reference mix from the batch table (the training-time
        // distribution); everything below is aggregate-sized
        val ref = Tables.events(s, dir)
          .groupBy($"event_type").agg(count(lit(1)).as("n_ref"))
        val k = ref.agg(count(lit(1)).as("k"),
          sum($"n_ref").as("n_tot"))
        // localCheckpoint: the sink table is referenced on both sides
        // of the grid join, and MemoryPlan can't re-instance itself for
        // a self-join (LogicalRDD can); the table is aggregate-sized
        val wc = s.table(sink)
          .select($"window_start", $"event_type", $"n")
          .localCheckpoint()
        val grid = wc.select($"window_start").distinct()
          .crossJoin(ref).crossJoin(k)
        val cells = grid
          .join(wc, Seq("window_start", "event_type"), "left")
          .select($"window_start", $"event_type", $"n_ref", $"k",
            $"n_tot", coalesce($"n", lit(0L)).as("nw"))
        val tot = cells.groupBy($"window_start")
          .agg(sum($"nw").as("n_events"))
        cells.join(tot, "window_start")
          .select($"window_start", $"event_type", $"n_events",
            (($"nw" + 0.5) / ($"n_events" + $"k" * 0.5)).as("pw"),
            ($"n_ref" * 1.0 / $"n_tot").as("pg"))
          .select($"window_start", $"n_events",
            struct($"event_type",
              round(($"pw" - $"pg") * log($"pw" / $"pg"), 9).as("term"))
              .as("cell"))
          .groupBy($"window_start")
          .agg(max($"n_events").as("n_events"),
            sort_array(collect_list($"cell")).as("arr"))
          .select($"window_start", $"n_events",
            round(expr("aggregate(transform(arr, e -> e.term), " +
              "cast(0.0 as double), (a, b) -> a + b)"), 6).as("psi"))
          .orderBy($"window_start")
      },
      Some("""WITH wc AS (SELECT date_trunc('hour', ts) AS window_start,
             |    event_type, count(*) AS n FROM events GROUP BY 1, 2),
             |ref AS (SELECT event_type, count(*) AS n_ref
             |  FROM events GROUP BY 1),
             |kk AS (SELECT count(*) AS k, CAST(sum(n_ref) AS BIGINT) AS n_tot
             |  FROM ref),
             |grid AS (SELECT w.window_start, r.event_type, r.n_ref,
             |    kk.k, kk.n_tot
             |  FROM (SELECT DISTINCT window_start FROM wc) w
             |  CROSS JOIN ref r CROSS JOIN kk),
             |cells AS (SELECT g.window_start, g.event_type, g.n_ref,
             |    g.k, g.n_tot, coalesce(wc.n, 0) AS nw
             |  FROM grid g LEFT JOIN wc USING (window_start, event_type)),
             |tot AS (SELECT window_start, CAST(sum(nw) AS BIGINT) AS n_events
             |  FROM cells GROUP BY 1),
             |terms AS (SELECT c.window_start, c.event_type, t.n_events,
             |    round(((c.nw + 0.5) / (t.n_events + 0.5 * c.k)
             |        - c.n_ref * 1.0 / c.n_tot)
             |      * ln(((c.nw + 0.5) / (t.n_events + 0.5 * c.k))
             |        / (c.n_ref * 1.0 / c.n_tot)), 9) AS term
             |  FROM cells c JOIN tot t USING (window_start)),
             |sw AS (SELECT window_start, n_events,
             |    list(term ORDER BY event_type) AS lt
             |  FROM terms GROUP BY 1, 2)
             |SELECT window_start, n_events,
             |  round(list_reduce(list_prepend(0.0::DOUBLE, lt),
             |    (a, b) -> a + b), 6) AS psi
             |FROM sw ORDER BY window_start""".stripMargin)),

    // Exactly-once parquet FILE sink round-trip: append-mode windowed
    // aggregates land in a real FileStreamSink (commit protocol +
    // _spark_metadata transaction log), then read back through the
    // metadata-aware reader — the persistence topology a production
    // stream actually ships results with (sm01-sm14 use the memory
    // sink). Only watermark-finalized windows may appear, and a
    // duplicated or orphaned sink file would double a count and fail
    // the hash — so the gate pins the sink's exactly-once contract,
    // not just the aggregation. Watermark cutoff math mirrors sm07.
    Q(
      "sm15_stream_file_sink",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val stage = Files.createTempDirectory("sm15_events")
        val out = Files.createTempDirectory("sm15_sink")
        val ckpt = Files.createTempDirectory("sm15_ckpt")
        def rmRec(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
          f.delete(): Unit
        }
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          q = stream
            .withWatermark("ts", "2 hours")
            .groupBy(window($"ts", "1 hour"), $"event_type")
            .agg(count(lit(1)).as("n"),
              sum($"value".cast("decimal(18,6)")).as("sv"))
            .select($"window.start".as("window_start"), $"event_type",
              $"n", round($"sv", 2).cast("double").as("sum_value"))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out.toString)
            .option("checkpointLocation", ckpt.toString)
            .start()
          q.processAllAvailable()
          q.stop(); q = null
          // the metadata-aware read: only files recorded in
          // _spark_metadata count, orphans are invisible
          s.read.parquet(out.toString)
            .select($"window_start", $"event_type", $"n", $"sum_value")
            .orderBy($"window_start", $"event_type")
            .localCheckpoint() // eager — the temp sink dirs go away below
        } finally {
          if (q != null) q.stop()
          Seq(stage, out, ckpt).foreach(p => rmRec(p.toFile))
        }
      },
      Some("""WITH w AS (SELECT (epoch_us(max(ts)) // 1000) * 1000
             |    - 7200000000 AS wm FROM events),
             |agg AS (SELECT date_trunc('hour', ts) AS window_start,
             |    event_type, count(*) AS n,
             |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
             |      AS sum_value
             |  FROM events GROUP BY 1, 2)
             |SELECT window_start, event_type, n, sum_value
             |FROM agg CROSS JOIN w
             |WHERE epoch_us(window_start + INTERVAL 1 HOUR) <= w.wm
             |ORDER BY window_start, event_type""".stripMargin)),

    // Streaming bottom-k sample — sk10's sketch maintained as stream
    // state (graft.streaming.DocStreams.bottomKSample): documents flow
    // through readStream into flatMapGroupsWithState holding the ≤64
    // smallest-hash triples per source, O(k) state forever. The gate
    // exploits the sketch's MERGEABILITY: the final streaming state
    // must equal the batch bottom-k of the whole corpus bit-for-bit,
    // whatever the micro-batching — so the BATCH oracle (sk10's samp
    // CTE) hash-gates the streaming path. Update-mode emissions
    // accumulate in the memory sink; nseen is strictly increasing, so
    // the rows carrying each source's max(nseen) are the final
    // snapshot.
    Q(
      "sm16_stream_bottomk",
      (s, dir) => {
        import s.implicits._
        val docSchema = Tables.documents(s, dir).schema
        val sink = s"sm16_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm16_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(docSchema).parquet(stage.toString)
          val docs = stream.select($"doc_id", $"source", $"n_chars",
              graft.functions.Fnv.fnv1a_perm(lit(1), $"doc_id").as("hv"))
            .as[graft.streaming.DocStreams.DocIn]
          q = graft.streaming.DocStreams.bottomKSample(docs, 64)
            .writeStream.outputMode("update")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        // window-max instead of a self-join: the memory view exposes one
        // attribute set, so joining it to itself trips conflicting refs
        val wMax = org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
        s.table(sink)
          .withColumn("mx", max($"nseen").over(wMax))
          .filter($"nseen" === $"mx")
          .select($"source", $"nseen", $"rk", $"doc_id", $"n_chars")
          .orderBy($"source", $"rk")
      },
      Some(s"""WITH h AS (SELECT doc_id, source, n_chars,
             |  ${FnvSql.toSigned(FnvSql.perm("1", "doc_id::HUGEINT"))} AS hv
             |  FROM documents),
             |n AS (SELECT source, count(*) AS nseen FROM h GROUP BY source),
             |samp AS (SELECT source, doc_id, n_chars,
             |  row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk
             |  FROM h
             |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 64)
             |SELECT s.source, n.nseen, CAST(s.rk AS INTEGER) AS rk,
             |  s.doc_id, s.n_chars
             |FROM samp s JOIN n USING (source)
             |ORDER BY s.source, rk""".stripMargin)),

    // Offline-train / online-score: the a29 quality classifier is
    // trained in BATCH (the same deterministic GD run), then the
    // document stream is scored per micro-batch with the model riding
    // along as broadcast literals — the standard topology for applying
    // a curation model at ingest time. Scoring is STATELESS (append
    // mode, no watermark, no state store), so the streamed scores must
    // equal the batch scores bit-for-bit whatever the micro-batching —
    // which is why a29's full training-replay oracle hash-gates this
    // query too.
    Q(
      "sm17_stream_quality_score",
      (s, dir) => {
        import s.implicits._
        val docSchema = Tables.documents(s, dir).schema
        val model = graft.operators.QualityModel.train(
          graft.operators.QualityModel.rawFeatures(
            graft.Par.fanOut(Tables.documents(s, dir))))
        val sink = s"sm17_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm17_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(docSchema).parquet(stage.toString)
          q = graft.operators.QualityModel
            .scored(graft.operators.QualityModel.rawFeatures(stream), model)
            .writeStream.outputMode("append")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .select($"doc_id", $"label", $"score", $"pred")
          .orderBy($"doc_id")
      },
      Some(AnalysisQueries.lrQualityOracle)),

    // Stream-static record linkage — d21's Fellegi-Sunter split into
    // the sm17 topology: u rates and log-likelihood weights are
    // ESTIMATED IN BATCH (RecordLinkage.weightLiterals — the same
    // expressions, collected as 2x3 doubles), then the record STREAM
    // scores against the broadcast dirty-source candidates and keeps
    // the best match per record via a streaming max(struct) aggregate.
    // Whatever the micro-batching, the result must hash-equal the
    // batch query — the oracle IS d21's.
    Q(
      "sm18_stream_linkage",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
        def aSide(df: org.apache.spark.sql.DataFrame) =
          df.select($"c_custkey".as("a_key"), $"c_name",
            $"c_nationkey", $"c_acctbal", $"c_mktsegment")
        val b = cust.select($"c_custkey".as("b_key"),
          substring($"c_name", 1, 16).as("nm16"),
          $"c_nationkey", round($"c_acctbal", -2).as("bal100"),
          $"c_mktsegment".as("segb"))
        def pairsOf(a: org.apache.spark.sql.DataFrame) =
          a.join(broadcast(b), Seq("c_nationkey"))
            .select($"a_key", $"b_key",
              (substring($"c_name", 1, 16) === $"nm16").as("agree_name"),
              (abs($"c_acctbal" - $"bal100") <= 50.0).as("agree_bal"),
              ($"c_mktsegment" === $"segb").as("agree_seg"))
        val cols = Seq("agree_name", "agree_bal", "agree_seg")
        val ms = Map("agree_name" -> 0.95, "agree_bal" -> 0.9,
          "agree_seg" -> 0.95)
        val wts = graft.operators.RecordLinkage.weightLiterals(
          pairsOf(aSide(graft.Par.fanOut(cust))), cols, ms,
          $"a_key" =!= $"b_key")
        val sink = s"sm18_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm18_cust")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/customer.parquet", stage, "customer")
          val stream = s.readStream.schema(cust.schema)
            .parquet(stage.toString)
          q = graft.operators.RecordLinkage
            .scoreWithWeights(pairsOf(aSide(stream)), cols, wts)
            .groupBy($"a_key")
            .agg(max(struct($"score", (-$"b_key").as("nb"), $"b_key",
              $"agree_name", $"agree_bal", $"agree_seg")).as("m"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .filter($"m.score" > 0)
          .select($"a_key", $"m.b_key".as("b_key"),
            $"m.agree_name".as("agree_name"),
            $"m.agree_bal".as("agree_bal"),
            $"m.agree_seg".as("agree_seg"), $"m.score".as("score"))
          .orderBy($"a_key")
      },
      Some(DedupQueries.linkageOracleSql)),

    // Decontamination AT INGEST — d20's exact-substring cut run as a
    // streaming topology: the duplicated-gram set is derived in batch
    // from the corpus, then the document STREAM is cut per micro-batch
    // against that static set inside foreachBatch (a doc's grams all
    // live in its own input row, so the cut is batch-local and the
    // pipeline keeps zero cross-batch state). Because the dup set
    // covers the same corpus the stream replays, the streamed output
    // must hash-equal the batch d20 — the oracle IS d20's.
    Q(
      "sm19_stream_span_cut",
      (s, dir) => {
        import s.implicits._
        val k = 40
        val docSchema = Tables.documents(s, dir).schema
        val base = Tables.documents(s, dir)
          .select($"doc_id".as("id"), $"text".as("t"))
        val dupHashes = graft.operators.Dedup.gramPositions(base, k)
          .groupBy($"gh").agg(count(lit(1)).as("cnt"))
          .filter($"cnt" >= 2).select($"gh").persist()
        dupHashes.count() // materialize before the stream starts
        val stage = Files.createTempDirectory("sm19_docs")
        val sinkRoot = Files.createTempDirectory("sm19_sink")
        val dataDir = sinkRoot.resolve("data").toString
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(docSchema)
            .parquet(stage.toString)
          q = stream.writeStream.outputMode("append")
            .foreachBatch {
              (batch: org.apache.spark.sql.DataFrame, _: Long) =>
                val b = batch.select(col("doc_id").as("id"),
                  col("text").as("t"))
                graft.operators.Dedup.cutSpansWith(b,
                    graft.operators.Dedup.gramPositions(b, k),
                    dupHashes, k)
                  .write.mode("append").parquet(dataDir)
            }
            .start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.read.parquet(dataDir)
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
          .localCheckpoint()
      },
      Some(DedupQueries.spanRemovalOracleSql)),

    // Streaming per-window approximate distinct users (sm21) — the
    // mergeable-sketch streaming story: each micro-batch contributes
    // (hour, register, ρ) rows and the streaming aggregate keeps
    // max(ρ) per register, which IS the HLL merge — max is
    // batch-order-invariant, so the streamed registers (and therefore
    // the estimate) equal the batch sketch bit-for-bit however the
    // files are micro-batched. State per window is m = 64 registers,
    // never the user set. The oracle replays the sk02 chain per hour
    // over the same events.
    Q(
      "sm21_stream_hll_users",
      (s, dir) => {
        import s.implicits._
        val fileSchema = Tables.eventsFileSchema(s, dir)
        val sink = s"sm21_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm21_events")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/events.parquet", stage, "events")
          val stream = Tables.normalizeEventTs(
            s.readStream.schema(fileSchema).parquet(stage.toString))
          val h = graft.functions.Fnv.fnv1a64($"user_id".cast("string"))
          q = stream
            .select(date_trunc("hour", $"ts").as("grp"),
              h.bitwiseAND(lit(63L)).cast("int").as("reg"),
              least(graft.functions.BitExprs.ntz_plus1(
                shiftrightunsigned(h, 6)), lit(59)).as("rho"))
            .groupBy($"grp", $"reg").agg(max($"rho").as("maxrho"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        // the memory-sink view keeps one set of expr-ids: self-joining
        // it trips conflicting-reference resolution — cut the plan
        val observed = s.table(sink).localCheckpoint()
        val grid = observed.select($"grp").distinct()
          .select($"grp", explode(sequence(lit(0), lit(63))).as("reg"))
        val regs = grid.join(observed, Seq("grp", "reg"), "left")
          .select($"grp", $"reg",
            coalesce($"maxrho", lit(0)).cast("int").as("maxrho"))
        graft.operators.HllSketch.estimates(regs, 6)
          .select($"grp".as("window_start"), $"zeros", $"est")
          .orderBy($"window_start")
      },
      Some {
        val scale = 64 - 6 + 1
        val numer = graft.operators.HllSketch.alphaM2(6) *
          math.pow(2.0, scale)
        s"""WITH vals AS (SELECT DISTINCT date_trunc('hour', ts) AS grp,
           |  user_id AS v FROM events),
           |h AS (SELECT grp, v, ${FnvSql.ofString("(v::VARCHAR)")} AS hu
           |  FROM vals),
           |${SketchQueries.powsSql},
           |rr AS (SELECT grp, v, (hu % 64::HUGEINT) AS reg,
           |  CAST(hu // 64::HUGEINT AS BIGINT) AS w FROM h),
           |rho AS (SELECT r.grp, r.v, r.reg,
           |  CASE WHEN r.w = 0 THEN 59 ELSE max(p.i) + 1 END AS rho
           |  FROM rr r LEFT JOIN pows p ON p.pv = (r.w & (-r.w))::HUGEINT
           |  GROUP BY r.grp, r.v, r.reg, r.w),
           |obs AS (SELECT grp, reg, max(rho) AS maxrho
           |  FROM rho GROUP BY grp, reg),
           |grid AS (SELECT g.grp, rg.reg,
           |  CAST(coalesce(o.maxrho, 0) AS INTEGER) AS maxrho
           |  FROM (SELECT DISTINCT date_trunc('hour', ts) AS grp
           |    FROM events) g
           |  CROSS JOIN (SELECT unnest(range(64)) AS reg) rg
           |  LEFT JOIN obs o ON o.grp = g.grp AND o.reg = rg.reg),
           |agg AS (SELECT grp,
           |  CAST(sum(CASE WHEN maxrho = 0 THEN 1 ELSE 0 END) AS INTEGER)
           |    AS zeros,
           |  sum(((1::BIGINT << ($scale - maxrho))::HUGEINT)) AS sscaled
           |  FROM grid GROUP BY grp)
           |SELECT grp AS window_start, zeros,
           |round(CASE WHEN ($numer / sscaled::DOUBLE) <= ${2.5 * 64}
           |    AND zeros > 0
           |  THEN ${64.0} * ln(${64.0} / zeros)
           |  ELSE ($numer / sscaled::DOUBLE) END, 3) AS est
           |FROM agg ORDER BY window_start""".stripMargin
      }),

    // Streaming corpus-novelty monitor: incoming documents (odd ids,
    // staged as arriving files) are trigram-exploded and checked
    // against the STATIC base vocabulary (even ids) through a
    // stream-static left join — the steady-state ingest signal that
    // tells a pipeline "this feed is drifting into new territory"
    // (the streaming counterpart of a38's Good-Turing P0). At 100 TB
    // the base gram table is the stored dedup/vocab index, bucketed on
    // the gram key; each micro-batch shuffles only its own grams.
    // Whatever the micro-batching, per-source totals are
    // batch-boundary-independent, so the result must hash-equal the
    // batch replay — which IS the oracle.
    Q(
      "sm22_stream_novelty",
      (s, dir) => {
        import s.implicits._
        import graft.text.{TextFunctions => TF}
        def grams(df: org.apache.spark.sql.DataFrame) = df
          .select($"doc_id", $"source", TF.tokenize($"text").as("t"))
          .where(size($"t") >= 3)
          .select($"doc_id", $"source", explode(expr(
            "transform(sequence(0, size(t)-3), " +
              "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("g"))
        val docSchema = Tables.documents(s, dir).schema
        val base = grams(graft.Par.fanOut(
            Tables.documents(s, dir).where($"doc_id" % 2 === 0)))
          .select($"g").distinct().withColumn("seen", lit(1))
        val sink = s"sm22_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stage = Files.createTempDirectory("sm22_docs")
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          stageParquet(s"$dir/documents.parquet", stage, "documents")
          val stream = s.readStream.schema(docSchema)
            .parquet(stage.toString).where($"doc_id" % 2 === 1)
          q = grams(stream)
            .join(base, Seq("g"), "left_outer")
            .groupBy($"source")
            .agg(count(lit(1)).as("n_grams"),
              sum(when($"seen".isNull, 1L).otherwise(0L)).as("n_novel"))
            .writeStream.outputMode("complete")
            .format("memory").queryName(sink).start()
          q.processAllAvailable()
        } finally {
          if (q != null) q.stop()
          rmStage(stage)
        }
        s.table(sink)
          .select($"source", $"n_grams", $"n_novel",
            round($"n_novel" * 1.0 / $"n_grams", 6).as("novelty"))
          .orderBy($"source")
      },
      Some("""WITH tok AS (SELECT doc_id, source,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |g AS (SELECT doc_id, source,
             |  unnest(list_transform(range(len(t)-2),
             |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS g
             |  FROM tok WHERE len(t) >= 3),
             |base AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
             |sg AS (SELECT source, g FROM g WHERE doc_id % 2 = 1)
             |SELECT sg.source, count(*) AS n_grams,
             |  CAST(sum(CASE WHEN b.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_novel,
             |  round(sum(CASE WHEN b.g IS NULL THEN 1 ELSE 0 END) * 1.0
             |    / count(*), 6) AS novelty
             |FROM sg LEFT JOIN base b ON sg.g = b.g
             |GROUP BY sg.source ORDER BY sg.source""".stripMargin))
  )
}
