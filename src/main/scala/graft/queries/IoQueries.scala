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

  /** Create a staging dir cleaned at JVM exit, NOT eagerly. The result
    * DataFrame is `localCheckpoint`ed before a query returns, but Spark
    * may still re-list source files afterwards (AQE stage retry,
    * speculative cleanup threads) — deleting the stage in a `finally`
    * raced those threads into spurious FileNotFoundException noise.
    * Staged data is a few MB; deferring cleanup to exit is free.
    */
  private val pendingCleanup =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val cleanupHook: Unit = { // ONE hook however many stages
    sys.addShutdownHook {
      var d = pendingCleanup.poll()
      while (d != null) {
        deleteRecursively(new java.io.File(d)); d = pendingCleanup.poll()
      }
    }: Unit
  }

  private def stageDir(prefix: String): String = {
    cleanupHook
    val d = Files.createTempDirectory(prefix).toString
    pendingCleanup.add(d)
    d
  }

  /** Stage → write(fmt) → read(fmt) → project → materialize. */
  private def roundTrip(s: SparkSession, dir: String)(
      write: (DataFrame, String) => Unit,
      read: (SparkSession, String, DataFrame) => DataFrame): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val stage = stageDir("graft_io")
    write(docs, stage)
    read(s, stage, docs)
      .select($"doc_id", length($"text").cast("long").as("n"),
        $"lang", $"source")
      .orderBy($"doc_id")
      .localCheckpoint()
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
        val stage = stageDir("graft_io4")
        docs.write.mode("overwrite").partitionBy("lang").parquet(stage)
        s.read.parquet(stage)
          .filter($"lang" === "en")
          .select($"doc_id", length($"text").cast("long").as("n"),
            $"lang", $"source")
          .orderBy($"doc_id")
          .localCheckpoint()
      },
      Some("""SELECT doc_id, length(text) AS n, lang, source
             |FROM documents WHERE lang = 'en' ORDER BY doc_id""".stripMargin)),

    // The REFERENCE'S OWN ingestion shape, in the gate: documents staged
    // as one header-carrying TSV file per product (file-per-product
    // naming, S2), read back through ReviewSource's schema'd glob scan —
    // product_id recovered from the FILE NAME via input_file_name() —
    // and exploded into positional sentences (P2). Text is single-lined
    // at staging (tabs/newlines → spaces), faithful to the reference
    // corpus; the oracle replays the same normalization and '.'-split
    // relationally from the parquet originals.
    Q(
      "io05_tsv_reviews",
      (s, dir) => {
        import s.implicits._
        val srcs = Seq("src0", "src1", "src2")
        val docs = Tables.documents(s, dir).filter($"source".isin(srcs: _*))
        val stage = stageDir("graft_io5")
        srcs.foreach { src =>
          val tmp = s"$stage/_w_$src"
          docs.filter($"source" === src)
            .select($"doc_id".cast("string").as("review_id"),
              lit("title").as("product_title"),
              lit(5).as("star_rating"), lit("N").as("vine"),
              lit("Y").as("verified_purchase"),
              regexp_replace($"text", "[\\t\\n\\r]", " ").as("review_body"))
            .coalesce(1).write.mode("overwrite")
            .option("sep", "\t").option("header", "true").csv(tmp)
          val part = new java.io.File(tmp).listFiles()
            .filter(_.getName.endsWith(".csv")).head
          Files.move(part.toPath,
            java.nio.file.Paths.get(s"$stage/$src.txt"))
        }
        val revs = graft.io.ReviewSource.reviews(s, s"$stage/*.txt")
        graft.io.ReviewSource.sentences(revs)
          .groupBy($"product_id")
          .agg(count(lit(1)).as("n_sentences"),
            countDistinct($"review_id").as("n_reviews"))
          .orderBy($"product_id")
          .localCheckpoint()
      },
      Some("""WITH r AS (SELECT doc_id::VARCHAR AS review_id, source,
             |    regexp_replace(text, '[\t\n\r]', ' ', 'g') AS body
             |  FROM documents WHERE source IN ('src0', 'src1', 'src2'))
             |SELECT source AS product_id,
             |CAST(sum(len(string_split(body, '.'))) AS BIGINT) AS n_sentences,
             |count(DISTINCT review_id) AS n_reviews
             |FROM r GROUP BY source ORDER BY product_id""".stripMargin)),

    // Small-file compaction — the table-maintenance operation every
    // 100 TB lake runs continuously (a scan over K small files pays K
    // task-schedule + open costs; compaction rewrites to size-targeted
    // files). The gate pins BOTH the file counts (from a real FS
    // listing, against the oracle's literals) and content equality
    // (row count + distinct-md5 cardinality survive the rewrite).
    Q(
      "io06_compaction",
      (s, dir) => {
        import s.implicits._
        val stage = stageDir("graft_io6")
        def parquetFiles(p: String): Long =
          Option(new java.io.File(p).listFiles()).map(
            _.count(f => f.getName.endsWith(".parquet")).toLong).getOrElse(0L)
        val docs = Tables.documents(s, dir)
        docs.repartition(16).write.mode("overwrite").parquet(s"$stage/small")
        val nSmall = parquetFiles(s"$stage/small")
        s.read.parquet(s"$stage/small")
          .repartition(2).sortWithinPartitions($"doc_id")
          .write.mode("overwrite").parquet(s"$stage/compact")
        val nCompact = parquetFiles(s"$stage/compact")
        val back = s.read.parquet(s"$stage/compact")
        back.agg(count(lit(1)).as("n_rows"),
            countDistinct(md5($"text")).as("n_distinct_md5"))
          .select(lit(nSmall).as("n_input_files"),
            lit(nCompact).as("n_compacted_files"),
            $"n_rows", $"n_distinct_md5")
          .localCheckpoint()
      },
      Some("""SELECT CAST(16 AS BIGINT) AS n_input_files,
             |CAST(2 AS BIGINT) AS n_compacted_files,
             |count(*) AS n_rows,
             |count(DISTINCT md5(text)) AS n_distinct_md5
             |FROM documents""".stripMargin)),

    // Schema evolution — the lake reality that columns ARRIVE over
    // time: an old writer emits (doc_id, lang), a newer one appends
    // (doc_id, lang, source) into the same dataset, and a
    // mergeSchema read unifies them (old rows null-padded). At 100 TB
    // this is why schema-on-read beats rewrite-the-corpus; per-file
    // footer schemas are reconciled at planning time, not by a data
    // pass.
    Q(
      "io07_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val stage = stageDir("graft_io7")
        docs.filter($"doc_id" < 250).select($"doc_id", $"lang")
          .write.mode("append").parquet(stage)
        docs.filter($"doc_id" >= 250).select($"doc_id", $"lang", $"source")
          .write.mode("append").parquet(stage)
        s.read.option("mergeSchema", "true").parquet(stage)
          .select($"doc_id", $"lang", $"source")
          .orderBy($"doc_id")
          .localCheckpoint()
      },
      Some("""SELECT doc_id, lang,
             |CASE WHEN doc_id >= 250 THEN source END AS source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Plain line-oriented text source (S1's rawest form — log shipping,
    // one-record-per-line corpora): docs single-lined and staged as
    // `id<TAB>text` lines via the real .text() writer, read back with
    // the real .text() reader, destructured on the first tab. The
    // oracle replays the same normalization + split from the parquet
    // originals, pinning line-level byte fidelity (tabs inside text
    // survive: split is on the FIRST tab only).
    Q(
      "io08_text_roundtrip",
      (s, dir) => {
        import s.implicits._
        val stage = stageDir("graft_io8")
        Tables.documents(s, dir)
          .select(concat($"doc_id".cast("string"), lit("\t"),
            regexp_replace($"text", "[\\n\\r]", " ")).as("value"))
          .write.mode("overwrite").text(stage)
        s.read.text(stage)
          .select(
            split($"value", "\t", 2).getItem(0).cast("long").as("doc_id"),
            split($"value", "\t", 2).getItem(1).as("body"))
          .select($"doc_id", length($"body").cast("long").as("n"),
            md5($"body").as("body_md5"))
          .orderBy($"doc_id")
          .localCheckpoint()
      },
      Some("""SELECT doc_id,
             |CAST(length(regexp_replace(text, '[\n\r]', ' ', 'g')) AS BIGINT) AS n,
             |md5(regexp_replace(text, '[\n\r]', ' ', 'g')) AS body_md5
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // DYNAMIC partition pruning — io04 prunes on a literal filter at
    // plan time; here the pruning value only exists at RUNTIME (it
    // comes from the dim side of a join), and Spark injects a
    // dynamicpruning subquery into the fact scan's PartitionFilters:
    // the dim is evaluated first, then only the matching fact
    // partitions are read. At 100 TB this is the difference between
    // scanning one date/priority partition and scanning the lake when
    // the filter arrives via a join rather than a WHERE literal.
    // PlanShapeSpec pins the dynamicpruning expression in the scan.
    Q(
      "io09_dynamic_pruning",
      (s, dir) => {
        import s.implicits._
        val stage = stageDir("graft_io9")
        Tables.orders(s, dir)
          .write.mode("overwrite").partitionBy("o_orderpriority")
          .parquet(s"$stage/fact")
        // dim staged as parquet, filtered on a NON-key column: a filter
        // on the join key itself would be propagated onto the fact scan
        // as a static literal (constraint propagation — no runtime
        // pruning needed); filtering on `tag` forces the partition
        // values to be discovered at runtime from the dim subquery.
        Tables.orders(s, dir)
          .select($"o_orderpriority").distinct()
          .withColumn("tag", substring($"o_orderpriority", 1, 1))
          .write.mode("overwrite").parquet(s"$stage/dim")
        val fact = s.read.parquet(s"$stage/fact")
        val dim = s.read.parquet(s"$stage/dim").filter($"tag" === "1")
        fact.join(dim, "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)"))
              .cast("double").as("total"))
          .localCheckpoint()
      },
      Some("""SELECT count(*) AS n,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_orderpriority LIKE '1%'""".stripMargin)),

    // Malformed-record routing (the dead-letter pattern): a CSV stage
    // with a deterministic corruption (every 13th doc's line breaks off
    // into an unclosed quote) read back in PERMISSIVE mode
    // with columnNameOfCorruptRecord — good rows parse, corrupt rows
    // surface as raw lines in the quarantine column instead of killing
    // the job. The gate pins BOTH routes: good-row id sums and a
    // position-independent FNV checksum over the quarantined raw
    // lines, which the oracle recomputes from the corruption rule — if
    // the parser ever accepted a corrupt line (or quarantined a good
    // one) the hash fails.
    Q(
      "io10_malformed_csv",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types._
        val docs = Tables.documents(s, dir)
        val stage = stageDir("graft_io10")
        docs.select(
            when($"doc_id" % 13 === 0,
              concat($"doc_id".cast("string"), lit(",\"broken")))
            .otherwise(concat_ws(",", $"doc_id",
              $"n_chars".cast("string"), $"lang", $"source"))
            .as("value"))
          .write.mode("overwrite").text(stage)
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("n_chars", LongType),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("_corrupt", StringType)))
        val read = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(stage)
          // materialize EVERY column before aggregating: CSV column
          // pruning would otherwise parse only (doc_id, _corrupt) for
          // the aggregate below, and a row whose malformation lives in
          // an unparsed column is never flagged (observed: pruning the
          // quote-broken n_chars/lang/source fields reported 0
          // quarantined rows)
          .localCheckpoint()
        read.agg(
            count(when($"_corrupt".isNull, 1)).as("n_good"),
            sum(when($"_corrupt".isNull, $"doc_id")).as("good_idsum"),
            count($"_corrupt").as("n_quarantined"),
            sum(pmod(graft.functions.Fnv.fnv1a64($"_corrupt"),
              lit(1000000007L))).as("quarantine_fnv"))
          .localCheckpoint()
      },
      Some(s"""WITH c AS (SELECT doc_id, n_chars, lang, source,
             |  doc_id % 13 = 0 AS bad,
             |  doc_id::VARCHAR || ',"broken' AS line
             |  FROM documents)
             |SELECT
             |  CAST(count(*) FILTER (WHERE NOT bad) AS BIGINT) AS n_good,
             |  CAST(sum(doc_id) FILTER (WHERE NOT bad) AS BIGINT)
             |    AS good_idsum,
             |  CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS n_quarantined,
             |  CAST(sum(((${FnvSql.toSigned(FnvSql.ofString("line"))}
             |      % 1000000007) + 1000000007) % 1000000007)
             |    FILTER (WHERE bad) AS BIGINT) AS quarantine_fnv
             |FROM c""".stripMargin)),

    // Release manifest — the artifact c29's snapshot diff consumes:
    // after a lang-partitioned write, one row per partition directory
    // with row count, file count and an ORDER-FREE content checksum
    // (sum of per-row FNV(doc_id:md5(text)) mod p — commutative, so
    // whatever task order wrote the files, the checksum is stable).
    // The repartition-by-key write pins one file per directory (each
    // lang's rows land in exactly one task), which the read-back
    // verifies via input_file_name(); the oracle recomputes the
    // manifest from the original table, proving the staged release
    // carries exactly the corpus content.
    Q(
      "io11_release_manifest",
      (s, dir) => {
        import s.implicits._
        val stage = stageDir("graft_io11")
        Tables.documents(s, dir)
          .repartition($"lang")
          .write.mode("overwrite").partitionBy("lang").parquet(stage)
        s.read.parquet(stage)
          // materialize the file name per row FIRST (an aggregate may
          // not wrap the non-deterministic expression directly)
          .withColumn("fname", input_file_name())
          .localCheckpoint()
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_rows"),
            countDistinct($"fname").cast("long").as("n_files"),
            sum(pmod(graft.functions.Fnv.fnv1a64(
              concat($"doc_id".cast("string"), lit(":"), md5($"text"))),
              lit(1000000007L))).as("checksum"))
          .orderBy($"lang")
          .localCheckpoint()
      },
      Some(s"""WITH c AS (SELECT lang,
             |  (((${FnvSql.toSigned(FnvSql.ofString(
                  "(doc_id::VARCHAR || ':' || md5(text))"))}
             |    % 1000000007) + 1000000007) % 1000000007) AS h
             |  FROM documents)
             |SELECT lang, count(*) AS n_rows,
             |  CAST(1 AS BIGINT) AS n_files,
             |  CAST(sum(h) AS BIGINT) AS checksum
             |FROM c GROUP BY lang ORDER BY lang""".stripMargin)),

    // Federated-format union (io12) — the lake reality of one logical
    // dataset living in three physical formats: the corpus staged as
    // parquet, JSONL and CSV, read back through each connector with
    // one explicit schema, unioned with a format lineage column. Every
    // format row reports the same count/idsum/content checksum — the
    // gate proves all three round-trips are LOSSLESS byte-for-byte on
    // content (the checksum hashes doc_id:md5(text)), so the oracle is
    // the documents table replicated per format label.
    Q(
      "io12_federated_union",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
        val stage = stageDir("graft_io12")
        docs.write.mode("overwrite").parquet(s"$stage/p")
        docs.write.mode("overwrite").json(s"$stage/j")
        docs.write.mode("overwrite").option("header", "true")
          .option("quoteAll", "true").csv(s"$stage/c")
        val schema = docs.schema
        val back = Seq(
          s.read.schema(schema).parquet(s"$stage/p")
            .withColumn("fmt", lit("parquet")),
          s.read.schema(schema).json(s"$stage/j")
            .withColumn("fmt", lit("jsonl")),
          s.read.schema(schema).option("header", "true")
            .csv(s"$stage/c").withColumn("fmt", lit("csv"))
        ).reduce(_ unionByName _)
        back.groupBy($"fmt")
          .agg(count(lit(1)).as("n_rows"),
            sum($"doc_id").as("idsum"),
            sum(pmod(graft.functions.Fnv.fnv1a64(
              concat($"doc_id".cast("string"), lit(":"), md5($"text"))),
              lit(1000000007L))).as("checksum"))
          .orderBy($"fmt")
          .localCheckpoint()
      },
      Some(s"""WITH c AS (SELECT doc_id,
             |  (((${FnvSql.toSigned(FnvSql.ofString(
                  "(doc_id::VARCHAR || ':' || md5(text))"))}
             |    % 1000000007) + 1000000007) % 1000000007) AS h
             |  FROM documents),
             |f AS (SELECT unnest(['csv', 'jsonl', 'parquet']) AS fmt)
             |SELECT fmt, (SELECT count(*) FROM c) AS n_rows,
             |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM c) AS idsum,
             |  (SELECT CAST(sum(h) AS BIGINT) FROM c) AS checksum
             |FROM f ORDER BY fmt""".stripMargin)),

    // Schema evolution via mergeSchema: a v1 slice written WITHOUT the
    // nt column and a v2 slice WITH it are read back as one table —
    // the append-only lakehouse reality where old files never get
    // rewritten when a pipeline adds a column. The merged read must
    // surface v1 rows with NULL nt (not 0, not an error), and the
    // per-source aggregate pins exactly that. Schema-first merged read;
    // at 100 TB mergeSchema=true costs one footer read per FILE, so
    // production keeps the merged schema in a catalog — this query
    // verifies the read SEMANTICS the catalog must reproduce.
    Q(
      "io13_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val stage = stageDir("graft_io13")
        docs.where($"doc_id" % 2 === 0)
          .select($"doc_id", $"source")
          .write.mode("overwrite").parquet(s"$stage/v1")
        docs.where($"doc_id" % 2 === 1)
          .select($"doc_id", $"source",
            graft.operators.TextAnalysis.wsTokenCount($"text")
              .cast("long").as("nt"))
          .write.mode("overwrite").parquet(s"$stage/v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$stage/v1", s"$stage/v2")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_rows"),
            count($"nt").as("n_with_nt"),
            coalesce(sum($"nt"), lit(0L)).as("nt_sum"))
          .orderBy($"source")
          .localCheckpoint()
      },
      Some("""SELECT source, count(*) AS n_rows,
             |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_with_nt,
             |  CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1
             |    THEN len(regexp_split_to_array(trim(text), '\s+'))
             |    ELSE 0 END), 0) AS BIGINT) AS nt_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin))
  )

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
