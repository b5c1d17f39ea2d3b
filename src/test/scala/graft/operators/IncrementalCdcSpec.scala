package graft.operators

import graft.SparkSpec

/** d26 incremental LSH probe + d27 content-defined chunking on
  * hand-built fixtures, including the property that MAKES chunking
  * content-defined: a front insertion re-aligns after the first
  * boundary instead of shifting every block.
  */
class IncrementalCdcSpec extends SparkSpec {

  private def words(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + r.nextInt(26)).toChar.toString * (1 + r.nextInt(3)))
      .mkString(" ")
  }

  test("incremental probe finds the planted delta duplicate only") {
    import spark.implicits._
    val shared = words(7, 40)
    val base = Seq((1L, shared), (2L, words(8, 40)), (3L, words(9, 40)))
      .toDF("id", "text")
      .select($"id", graft.text.TextFunctions.tokenize($"text").as("tokens"))
    val delta = Seq((10L, shared), (11L, words(12, 40)))
      .toDF("id", "text")
      .select($"id", graft.text.TextFunctions.tokenize($"text").as("tokens"))
    val out = Dedup.incrementalNearDuplicates(base, delta,
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy($"id")
      .as[(Long, Long, Option[Long], Option[Double])].collect()
    assert(out.map(_._1).toSeq == Seq(10L, 11L))
    assert(out(0)._2 == 1L && out(0)._3.contains(1L) &&
      out(0)._4.contains(1.0))
    assert(out(1)._2 == 0L && out(1)._3.isEmpty)
  }

  test("cdc chunking: exact copies are fully duplicated") {
    import spark.implicits._
    val s = words(21, 80)
    val out = Dedup.cdcChunkDedup(
      Seq((1L, s), (2L, s), (3L, words(22, 80))).toDF("id", "text"),
      "id", "text", window = 8, mask = 63)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out(0)._5 == 1.0 && out(1)._5 == 1.0)
    assert(out(0)._2 == out(1)._2) // same chunk count
    assert(out(2)._5 == 0.0)
  }

  test("cdc chunking re-aligns after a front insertion (the CDC property)") {
    import spark.implicits._
    val s = words(33, 120)
    val shifted = "zzz " + s
    val out = Dedup.cdcChunkDedup(
      Seq((1L, s), (2L, shifted)).toDF("id", "text"),
      "id", "text", window = 8, mask = 63)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Double)].collect()
    // every boundary test depends only on the local 8-char window, so
    // chunks after the first shared boundary are identical — a
    // fixed-size blocker would share (almost) nothing here
    assert(out(0)._3 > 0L, s"expected shared trailing chunks, got ${out.toSeq}")
    assert(out(0)._5 > 0.5, s"expected majority duplicated chars, got ${out.toSeq}")
  }

  test("cdc chunks cover each doc exactly (chars partition)") {
    import spark.implicits._
    val docs = Seq((1L, words(41, 60)), (2L, words(42, 5)), (3L, "ab"))
      .toDF("id", "text")
    val out = Dedup.cdcChunkDedup(docs, "id", "text", window = 8, mask = 15)
      .orderBy($"id").collect()
    val lens = docs.select($"id", org.apache.spark.sql.functions.length($"text"))
      .as[(Long, Int)].collect().toMap
    // dup_frac denominator is sum(clen); if chunks partitioned the doc,
    // a doc with zero dups reports exactly 0.0 and n_chunks >= 1
    out.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(lens.contains(r.getLong(0)))
    }
    // the 2-char doc is a single chunk
    assert(out.find(_.getLong(0) == 3L).get.getLong(1) == 1L)
  }
}
