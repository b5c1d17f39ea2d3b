package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.tables.Tables

/** Checkpoint-recovery — the production streaming property the gate's
  * single-run replays can't show: a query killed between micro-batches
  * and restarted from the same `checkpointLocation` must (a) not
  * reprocess data it already committed, (b) pick up files that arrived
  * while it was down, and (c) be a no-op when restarted with nothing
  * new. The sink is sm06's foreachBatch upsert (anti-join + append +
  * atomic swap — the filesystem stand-in for a Delta/Iceberg MERGE),
  * which together with the checkpoint gives end-to-end effectively-once
  * output; final state must equal the batch aggregate bit-for-bit
  * (DECIMAL value sums, so batch boundaries can't move an ulp).
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def rmRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRec))
    f.delete(): Unit
  }

  test("foreachBatch upsert killed mid-stream resumes from the " +
    "checkpoint and converges to the batch aggregate") {
    val dir = sf("sf0.001")
    val fileSchema = Tables.eventsFileSchema(spark, dir)
    val stage = Files.createTempDirectory("rec_events")
    val scratch = Files.createTempDirectory("rec_scratch")
    val ckpt = scratch.resolve("ckpt").toString
    val dataDir = scratch.resolve("data").toString

    def stageSlice(i: Int): Unit = {
      val tmp = scratch.resolve(s"slice$i").toString
      spark.read.schema(fileSchema).parquet(s"$dir/events.parquet")
        .filter($"event_id" % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, stage.resolve(f"events_$i%02d.parquet")): Unit
    }

    def runUntilDrained(): Unit = {
      var q: StreamingQuery = null
      try {
        val stream = spark.readStream.schema(fileSchema)
          .option("maxFilesPerTrigger", "1").parquet(stage.toString)
        q = stream.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum($"value".cast("decimal(18,6)")).as("sum_value"))
          .writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
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
            rmRec(cur)
            Files.move(Paths.get(tmpOut), Paths.get(dataDir)): Unit
          }
          .start()
        q.processAllAvailable()
      } finally if (q != null) q.stop()
    }

    def state(): Seq[(Long, Long, Double)] =
      spark.read.parquet(dataDir)
        .select($"user_id".cast("long"), $"n_events".cast("long"),
          round($"sum_value", 2).cast("double"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq

    try {
      // run 1: only slice 0 exists; the query commits it and is killed
      stageSlice(0)
      runUntilDrained()
      val afterKill = state()
      assert(afterKill.nonEmpty)

      // downtime: two more slices land while no query is running
      stageSlice(1)
      stageSlice(2)

      // run 2: restart from the SAME checkpoint — must process exactly
      // the new files and fold them into the committed state
      runUntilDrained()
      val recovered = state()

      // run 3: restart again with nothing new — recovery must be a
      // no-op, not a reprocess (idempotence of the committed log)
      runUntilDrained()
      assert(state() === recovered, "restart with no new data changed state")

      val want = Tables.events(spark, dir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,6)")).as("sum_value"))
        .select($"user_id".cast("long"), $"n_events".cast("long"),
          round($"sum_value", 2).cast("double"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(recovered === want, "recovered state != batch aggregate")
      // and the kill really was mid-stream: run 1 saw strictly less
      assert(afterKill !== want)
    } finally {
      rmRec(stage.toFile)
      rmRec(scratch.toFile)
    }
  }

  test("stateful streaming is backend-agnostic: RocksDB state store " +
    "produces the HDFS-backed results bit-for-bit") {
    // local[n] runs the in-memory HDFSBackedStateStore by default; a
    // 1000-executor cluster runs RocksDB (state larger than heap).
    // The windowed aggregation must not care which backend holds it.
    val dir = sf("sf0.001")
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    def runWindowed(): Seq[String] = {
      val sink = s"rdb_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val stage = Files.createTempDirectory("rdb_events")
      var q: StreamingQuery = null
      try {
        val fileSchema = Tables.eventsFileSchema(spark, dir)
        spark.read.schema(fileSchema).parquet(s"$dir/events.parquet")
          .coalesce(1).write.mode("overwrite")
          .parquet(stage.resolve("in").toString)
        q = EventStreams.windowedCounts(
          Tables.normalizeEventTs(spark.readStream.schema(fileSchema)
            .parquet(stage.resolve("in").toString)), "1 hour")
          .writeStream.outputMode("complete")
          .format("memory").queryName(sink).start()
        q.processAllAvailable()
        spark.table(sink)
          .select($"window_start", $"event_type", $"n",
            round($"sum_value", 2).cast("double").as("sum_value"))
          .collect().map(_.toString).sorted.toSeq
      } finally {
        if (q != null) q.stop()
        rmRec(stage.toFile)
      }
    }
    val default = runWindowed()
    val before = spark.conf.getOption(providerConf)
    spark.conf.set(providerConf, rocks)
    try {
      val viaRocks = runWindowed()
      assert(viaRocks === default,
        "RocksDB state store diverged from the default backend")
      assert(default.nonEmpty)
    } finally before match {
      case Some(v) => spark.conf.set(providerConf, v)
      case None => spark.conf.unset(providerConf)
    }
  }
}
