package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Fnv

/** The property sm16's gate can't isolate: with the corpus split across
  * THREE micro-batches (maxFilesPerTrigger = 1), the state after the
  * last batch must still equal the batch bottom-k of the union —
  * the mergeability of bottom-k-by-hash carried through real
  * flatMapGroupsWithState state-store round-trips, not just a
  * single-batch pass.
  */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming bottom-k over 3 micro-batches equals the batch sample") {
    val docs = Tables.docsFixture(spark)
    val stage = Files.createTempDirectory("docstreams_spec")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // three disjoint slices → three files → three micro-batches
      (0 until 3).foreach { slice =>
        docs.filter($"doc_id" % 3 === slice)
          .coalesce(1).write.mode("append").parquet(stage.toString)
      }
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .select($"doc_id", $"source", $"n_chars",
          Fnv.fnv1a_perm(lit(1), $"doc_id").as("hv"))
        .as[DocStreams.DocIn]
      val sink = "docstreams_spec_sink"
      q = DocStreams.bottomKSample(stream, 8)
        .writeStream.outputMode("update")
        .format("memory").queryName(sink).start()
      q.processAllAvailable()
      q.stop(); q = null

      val w = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      val streamed = spark.table(sink)
        .withColumn("mx", max($"nseen").over(w))
        .filter($"nseen" === $"mx")
        .select($"source", $"rk", $"doc_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet

      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"source")
        .orderBy($"hv", $"doc_id")
      val batch = docs
        .select($"doc_id", $"source",
          Fnv.fnv1a_perm(lit(1), $"doc_id").as("hv"))
        .withColumn("rk", row_number().over(wB))
        .filter($"rk" <= 8)
        .select($"source", $"rk", $"doc_id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet

      assert(streamed == batch)
      assert(batch.nonEmpty)
      // multiple sources and real truncation (some source has > 8 docs)
      assert(batch.map(_._1).size >= 2)
    } finally {
      if (q != null) q.stop()
      val d = stage.toFile
      Option(d.listFiles()).foreach(_.foreach { f =>
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(_.delete()))
        f.delete()
      })
      d.delete()
    }
  }

  test("streaming quality scoring over 3 micro-batches equals batch " +
    "scoring with the same trained model") {
    import graft.operators.QualityModel
    // deterministic texts straddling the label gate (length >= 150)
    val docs = (1L to 30L).map { id =>
      (id, ("word " * (id * 13 % 60).toInt) + id.toString)
    }.toDF("doc_id", "text")
    val model = QualityModel.train(QualityModel.rawFeatures(docs))
    val stage = Files.createTempDirectory("docstreams_sm17")
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      (0 until 3).foreach { slice =>
        docs.filter($"doc_id" % 3 === slice)
          .coalesce(1).write.mode("append").parquet(stage.toString)
      }
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
      val sink = "docstreams_sm17_sink"
      q = QualityModel.scored(QualityModel.rawFeatures(stream), model)
        .writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      q.processAllAvailable()
      q.stop(); q = null
      val streamed = spark.table(sink)
        .select($"doc_id", $"label", $"score", $"pred")
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
        .toSet
      val batch = QualityModel.scored(QualityModel.rawFeatures(docs), model)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
        .toSet
      assert(streamed == batch)
      assert(batch.size == 30)
      // the fixture really straddles the gate
      assert(batch.exists(_._2 == 1) && batch.exists(_._2 == 0))
    } finally {
      if (q != null) q.stop()
      val d = stage.toFile
      Option(d.listFiles()).foreach(_.foreach { f =>
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(_.delete()))
        f.delete()
      })
      d.delete()
    }
  }

  private object Tables {
    /** 60 docs over 4 sources with deterministic lengths. */
    def docsFixture(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      (1L to 60L).map { id =>
        (id, s"src${id % 4}", 100L + (id * 37) % 500)
      }.toDF("doc_id", "source", "n_chars")
    }
  }
}
