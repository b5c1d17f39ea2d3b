package graft.tables

import org.apache.spark.sql.{types, DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All engine queries read through here so that scan options stay uniform.
  * Parquet + explicit column pruning/predicate pushdown are handled by
  * Catalyst's DataSource V2 path; nothing to hand-tune at this layer.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Harness generations differ in how events.parquet stores `ts`:
    * annotated INT64 TIMESTAMP(MICROS) (reads natively as TimestampType)
    * vs raw INT64 nanoseconds — including TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects at schema inference. [[eventsFileSchema]]
    * probes the file once and [[normalizeEventTs]] converts a raw-nanos
    * long to microseconds (the truncation DuckDB applies when coercing to
    * its microsecond TIMESTAMP, so oracle comparisons line up either way).
    */
  private val eventsSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, types.StructType]()

  def eventsFileSchema(s: SparkSession, d: String): types.StructType = {
    // one probe per (session, dir, file state): queries that call
    // eventsFileSchema AND Tables.events (sm07/sm09) no longer launch
    // redundant inference jobs. The file mtime+length in the key
    // invalidates the entry when events.parquet is rewritten in-place
    // within one JVM (Stress replica rebuilds, test-data regeneration) —
    // a same-path rewrite with a different physical ts type must re-probe.
    val f = new java.io.File(s"$d/events.parquet")
    val key = s"${System.identityHashCode(s)}:$d:${f.lastModified}:${f.length}"
    eventsSchemaCache.computeIfAbsent(key, _ => probeEventsSchema(s, d))
  }

  private def probeEventsSchema(s: SparkSession, d: String): types.StructType = {
    import org.apache.spark.sql.types._
    val path = s"$d/events.parquet"
    // missing file must surface here, not as a misleading downstream error
    // after silently taking the raw-nanos fallback
    if (!new java.io.File(path).exists())
      throw new java.io.FileNotFoundException(s"events table not found: $path")
    val rawNs = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    try s.read.parquet(path).schema
    catch {
      // TIMESTAMP(NANOS) makes inference itself throw ("Illegal Parquet
      // type ...") -> raw-long fallback. Anything else (corrupt footer,
      // permission, IO) rethrows.
      case e: Exception if Option(e.getMessage).exists(m =>
          m.contains("Parquet") || m.contains("parquet")) => rawNs
    }
  }

  /** Normalize an events read (batch or stream) to a TimestampType `ts`:
    * identity when the file is timestamp-annotated, nanos->micros when
    * the schema came out of the raw-long fallback.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case types.TimestampNTZType =>
        // isAdjustedToUTC=false may infer as NTZ; downstream operators
        // (unix_micros, windows) expect TimestampType. The session zone is
        // pinned to UTC, so the cast preserves the stored wall-clock.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(types.TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(
      s.read.schema(eventsFileSchema(s, d)).parquet(s"$d/events.parquet"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
