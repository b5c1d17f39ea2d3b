package graft.misc

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** A partition-key filter over a Hive-partitioned layout must be
  * satisfied by PRUNING (directory-level elision at planning time),
  * not by scanning everything and filtering rows — the mechanism
  * io04 relies on at 100 TB.
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("lang filter prunes partitions of a partitioned parquet layout") {
    val stage = Files.createTempDirectory("graft_prune").toString
    try {
      Tables.documents(spark, sf("sf0.001"))
        .write.mode("overwrite").partitionBy("lang").parquet(stage)
      val q = spark.read.parquet(stage).filter($"lang" === "en")
        .select($"doc_id", $"lang")
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec in plan"))
      assert(scan.partitionFilters.exists(_.toString.contains("lang")),
        s"lang not in partition filters: ${scan.partitionFilters}")
      // pruning happened: only the lang=en directory's files are read
      val langs = Tables.documents(spark, sf("sf0.001"))
        .select($"lang").distinct().count()
      assert(langs > 1, "fixture must be multi-lang for this test to bite")
      assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .forall(_.values.toString.contains("en")))
      // and the pruned read returns exactly the en rows
      val expected = Tables.documents(spark, sf("sf0.001"))
        .filter($"lang" === "en").count()
      assert(q.count() == expected)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(stage))
    }
  }
}
