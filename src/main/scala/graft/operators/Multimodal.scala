package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §7.5): media as opaque `binary`
  * payloads with typed metadata, processed by partition-batched
  * decode/feature kernels.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but every Spark-side piece the
  * real kernel needs is genuine and tested: the (id, modality, payload,
  * meta) schema, iterator-to-iterator `mapPartitions` (decoder state is
  * initialized once per partition, NOT per row — the local equivalent of
  * a Pandas-UDF batch loop), explicit output schema, and partition-count
  * preservation. Swapping in a real JNI/FFmpeg/pillow-equivalent kernel
  * changes only the body of `decodeStub`.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("declared_lang", StringType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)))

  /** Wrap a text corpus into the media schema (UTF-8 payloads standing in
    * for image/audio bytes; modality round-robins for test coverage).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // declared_lang is optional metadata — null when the corpus has none
    val lang = if (docs.columns.contains("lang")) col("lang")
      else lit(null).cast("string")
    docs.select(
      col(idCol).cast("long").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        lang.as("declared_lang")).as("meta"))
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", LongType, nullable = false),
    StructField("frame_checksum", LongType, nullable = false)))

  /** STUB frame-sampling kernel — the 1→many batch shape a video frame
    * sampler has (decodeStub is the 1→1 shape): every `stride`-th
    * window of `frameBytes` payload bytes becomes one output row, with
    * an FNV-1a checksum of the window standing in for the decoded frame
    * tensor. flatMap keeps it iterator-to-iterator, so a real decoder
    * would stream frames without materializing a per-document list.
    */
  def frameSampleStub(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions { it =>
        // one-time per-partition decoder init would happen HERE
        it.flatMap { r =>
          val id = r.getLong(r.fieldIndex("id"))
          val modality = r.getString(r.fieldIndex("modality"))
          val payload = r.getAs[Array[Byte]]("payload")
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            val lo = f * frameBytes
            val hi = math.min(lo + frameBytes, n)
            var h = 0xcbf29ce484222325L
            var i = lo
            while (i < hi) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
            Row(id, modality, f, (hi - lo).toLong, h)
          }
        }
      }, frameSchema)
  }

  /** STUB decode/feature-extract kernel. Deterministic fake standing in
    * for the real decoder: frame count = ceil(bytes/256), checksum =
    * FNV-1a over the payload, feature = 4 moments of the byte stream.
    * Real implementation would decode frames/samples here — per
    * partition, reusing one decoder instance.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions { it =>
        // one-time per-partition "decoder" init happens HERE in a real kernel
        it.map { r =>
          val id = r.getLong(r.fieldIndex("id"))
          val modality = r.getString(r.fieldIndex("modality"))
          val payload = r.getAs[Array[Byte]]("payload")
          val bytes = if (payload == null) Array.emptyByteArray else payload
          var h = 0xcbf29ce484222325L
          bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
          val n = bytes.length
          val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
          val mx = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).max
          val mn = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).min
          Row(id, modality, n.toLong, (n + 255) / 256, h,
            Seq(n.toDouble, mean, mn, mx))
        }
      }, featureSchema)
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** STUB perceptual-hash kernel (dHash): bit i is set iff "pixel"
    * i+1 > pixel i over the first 61 payload bytes — 60 bits, so the
    * value stays positive in engines without unsigned 64-bit ints;
    * bytes past the payload read as 0. A real kernel would resize the
    * decoded image to a 9×8 grayscale grid and compare adjacent
    * pixels; the comparison topology, the banding, and the bucket
    * join downstream are identical either way — swapping in a real
    * decoder changes only this body.
    */
  def dHashStub(media: DataFrame): DataFrame = {
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions { it =>
        // one-time per-partition decoder init would happen HERE
        it.map { r =>
          val id = r.getLong(r.fieldIndex("id"))
          val modality = r.getString(r.fieldIndex("modality"))
          val payload = r.getAs[Array[Byte]]("payload")
          val bytes = if (payload == null) Array.emptyByteArray else payload
          def px(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
          var h = 0L
          var i = 0
          while (i < 60) { if (px(i + 1) > px(i)) h |= 1L << i; i += 1 }
          Row(id, modality, h)
        }
      }, dhashSchema)
  }

  val energySchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("win", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))

  /** STUB audio-energy kernel (the DSP half of voice-activity
    * detection): the payload is windowed into `frameBytes`-byte frames
    * (160 bytes ≈ one 10 ms frame of 8-bit 16 kHz mono) and each frame
    * emits its INTEGER sum of squared sample values — exact under any
    * partitioning, so the voiced/unvoiced decision downstream is a
    * pure integer comparison (sumsq ≥ threshold·n), never a float
    * mean. A real kernel would decode the container and window PCM
    * samples here; the 1→many batch shape, schema, and iterator
    * streaming are exactly what that kernel needs.
    */
  def audioEnergyStub(media: DataFrame, frameBytes: Int = 160): DataFrame = {
    require(frameBytes > 0)
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions { it =>
        // one-time per-partition decoder init would happen HERE
        it.flatMap { r =>
          val id = r.getLong(r.fieldIndex("id"))
          val modality = r.getString(r.fieldIndex("modality"))
          val payload = r.getAs[Array[Byte]]("payload")
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val n = bytes.length
          val nWins = (n + frameBytes - 1) / frameBytes
          (0 until nWins).iterator.map { w =>
            val lo = w * frameBytes
            val hi = math.min(lo + frameBytes, n)
            var ss = 0L
            var i = lo
            while (i < hi) {
              val v = (bytes(i) & 0xff).toLong; ss += v * v; i += 1
            }
            Row(id, modality, w, (hi - lo).toLong, ss)
          }
        }
      }, energySchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("cell", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** STUB resize kernel: area-average resample of the payload byte
    * stream onto a FIXED `cells`-cell grid — source position p lands in
    * cell ⌊p·cells/n⌋ (exact integer arithmetic), each cell emits the
    * round-6 mean of its bytes, empty cells (n < cells) emit 0. A real
    * kernel would decode and bilinear-resize the 2-D image here; the
    * fixed output shape, the per-partition batch iterator, and the
    * long-form (id, cell, value) schema the downstream featurizer
    * consumes are identical either way.
    */
  def resizeStub(media: DataFrame, cells: Int = 64): DataFrame = {
    require(cells > 0)
    media.sparkSession.createDataFrame(
      media.rdd.mapPartitions { it =>
        // one-time per-partition decoder init would happen HERE
        it.flatMap { r =>
          val id = r.getLong(r.fieldIndex("id"))
          val modality = r.getString(r.fieldIndex("modality"))
          val payload = r.getAs[Array[Byte]]("payload")
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val n = bytes.length
          val sums = new Array[Long](cells)
          val cnts = new Array[Long](cells)
          var p = 0
          while (p < n) {
            val c = ((p.toLong * cells) / n).toInt
            sums(c) += (bytes(p) & 0xff).toLong
            cnts(c) += 1
            p += 1
          }
          (0 until cells).iterator.map { c =>
            val v =
              if (cnts(c) == 0L) 0.0
              else java.math.BigDecimal.valueOf(sums(c) * 1.0 / cnts(c))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
            Row(id, modality, c, v)
          }
        }
      }, resizeSchema)
  }
}
