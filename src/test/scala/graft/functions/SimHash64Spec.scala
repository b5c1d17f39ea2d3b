package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SimHash64 — the fused signature. Pins bit-equality against the HOF
  * composition it replaced inside Dedup.simhash (outer fold over 64 bit
  * positions, inner ±1-vote fold over token hashes) on real corpus
  * tokens plus the null corners, so the swap cannot move any SimHash
  * band, candidate pair, or oracle hash.
  */
class SimHash64Spec extends SparkSpec {

  /** The exact composition Dedup.simhash used before the fusion. */
  private def hofSimhash(tokens: org.apache.spark.sql.Column) = {
    val hs = transform(tokens, t => graft.functions.Fnv.fnv1a64(t))
    aggregate(
      sequence(lit(0L), lit(63L)),
      lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(
          aggregate(hs, lit(0),
            (v, h) => v + when(
              call_function("shiftrightunsigned", h, i)
                .bitwiseAND(lit(1L)) === lit(1L), 1).otherwise(-1)) > 0,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))))
  }

  private def fused(tokens: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))

  test("bit-equal to the HOF composition on corpus tokens") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = docs.select($"doc_id",
        fused(graft.text.TextFunctions.tokenize($"text")).as("f"),
        hofSimhash(graft.text.TextFunctions.tokenize($"text")).as("h"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.get(0)}: fused ${r.getLong(1)} vs HOF ${r.getLong(2)}")
    }
    // sanity: signatures are non-trivial (not all zero)
    assert(rows.count(_.getLong(1) != 0L) > 450)
  }

  test("null corners mirror the composition") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq("alpha", "beta"))),
      (2L, Some(Seq("alpha", null))),   // null element votes -1 per bit
      (3L, Some(Seq.empty[String])),    // empty -> 0L
      (4L, None)                        // null array -> 0L
    ).toDF("id", "toks")
    val rows = df.select($"id", fused($"toks").as("f"), hofSimhash($"toks").as("h"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2), s"row $r: both sides non-null")
      assert(r.getLong(1) == r.getLong(2), s"row $r")
    }
    assert(rows(2).getLong(1) == 0L && rows(3).getLong(1) == 0L)
  }
}
