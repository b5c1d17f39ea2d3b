package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Source/sink format coverage (SURVEY §2.1 S-family beyond parquet):
  * the documents table is round-tripped through each format's REAL
  * writer+reader (distributed, schema'd) and the recovered rows are
  * hash-compared against the parquet originals via the oracle. This
  * gates byte-level fidelity of the format paths — quoting, escaping,
  * multi-line records, unicode — not just "a file appeared".
  *
  * The round-trip result is `localCheckpoint`ed (eagerly materialized,
  * lineage cut) so the staging directory can be deleted before the
  * gate writes the output parquet.
  */
object IoQueries extends QueryProvider {

  /** Stage → write(fmt) → read(fmt) → project → materialize → clean. */
  private def roundTrip(s: SparkSession, dir: String)(
      write: (DataFrame, String) => Unit,
      read: (SparkSession, String, DataFrame) => DataFrame): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val stage = Files.createTempDirectory("graft_io").toString
    try {
      write(docs, stage)
      read(s, stage, docs)
        .select($"doc_id", length($"text").cast("long").as("n"),
          $"lang", $"source")
        .orderBy($"doc_id")
        .localCheckpoint()
    } finally deleteRecursively(new java.io.File(stage))
  }

  private val oracle: String =
    """SELECT doc_id, length(text) AS n, lang, source
      |FROM documents ORDER BY doc_id""".stripMargin

  override val all: Seq[Q] = Seq(

    // Newline-delimited JSON: the interchange format document pipelines
    // actually ingest. Schema-first read (no sampling-based inference
    // job — at 100 TB an inference pass is a full extra scan).
    Q(
      "io01_jsonl_roundtrip",
      (s, dir) => roundTrip(s, dir)(
        (df, p) => df.write.mode("overwrite").json(p),
        (sp, p, orig) => sp.read.schema(orig.schema).json(p)),
      Some(oracle)),

    // CSV with quoted multi-line text fields — the hostile case for
    // delimited formats (documents contain newlines and quotes).
    Q(
      "io02_csv_roundtrip",
      (s, dir) => roundTrip(s, dir)(
        (df, p) => df.write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true").csv(p),
        (sp, p, orig) => sp.read.schema(orig.schema)
          .option("header", "true").option("multiLine", "true").csv(p)),
      Some(oracle)),

    // ORC: the columnar alternative to parquet (predicate pushdown,
    // column pruning and vectorized read all apply as with parquet).
    Q(
      "io03_orc_roundtrip",
      (s, dir) => roundTrip(s, dir)(
        (df, p) => df.write.mode("overwrite").orc(p),
        (sp, p, orig) => sp.read.schema(orig.schema).orc(p)),
      Some(oracle)),

    // Hive-style partitioned layout: write partitioned by lang, read
    // back with a partition-key filter. The filter is satisfied by
    // PRUNING (only the lang=en directory is listed/scanned — the
    // mechanism that turns a 100 TB corpus scan into a single-
    // partition read); ContractSpec asserts the pruned plan shape.
    Q(
      "io04_partitioned_roundtrip",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val stage = Files.createTempDirectory("graft_io4").toString
        try {
          docs.write.mode("overwrite").partitionBy("lang").parquet(stage)
          s.read.parquet(stage)
            .filter($"lang" === "en")
            .select($"doc_id", length($"text").cast("long").as("n"),
              $"lang", $"source")
            .orderBy($"doc_id")
            .localCheckpoint()
        } finally deleteRecursively(new java.io.File(stage))
      },
      Some("""SELECT doc_id, length(text) AS n, lang, source
             |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin))
  )

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
