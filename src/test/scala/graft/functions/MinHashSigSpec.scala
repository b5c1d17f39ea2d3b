package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MinHashSig — the fused signature build. Pins bit-equality against
  * the HOF composition it replaces (transform-sequence-array_min over
  * fnv1a_perm) on real corpus shingle hashes, plus the null corners,
  * so the swap inside Dedup.minhashSignature cannot move any LSH
  * bucket, candidate pair, or oracle hash.
  */
class MinHashSigSpec extends SparkSpec {

  private def hofSig(hashes: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(0), lit(n - 1)),
      i => array_min(transform(hashes,
        h => graft.functions.Fnv.fnv1a_perm(i.cast("int"), h))))

  private def fusedSig(hashes: org.apache.spark.sql.Column, n: Int) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(hashes), n))

  test("bit-equal to the HOF composition on corpus shingles") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val hv = docs.select($"doc_id",
      graft.operators.Dedup.shingleHashes(
        graft.operators.Dedup.shingles(
          graft.text.TextFunctions.tokenize($"text"), 3)).as("hv"))
      .filter(size($"hv") > 0)
    val rows = hv.select($"doc_id",
        fusedSig($"hv", 32).as("f"), hofSig($"hv", 32).as("h"))
      .collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.get(0)}: fused and HOF signatures diverge")
    }
  }

  test("null corners mirror the composition") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(42L, -7L))),
      (2L, Some(Seq.empty[Long])),   // array_min(empty) -> null elements
      (3L, None)                     // null array -> all-null ELEMENTS
    ).toDF("id", "hv")
    val rows = df.select($"id", fusedSig($"hv", 4).as("f"), hofSig($"hv", 4).as("h"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"row $r nullness")
      if (!r.isNullAt(1))
        assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"row $r")
    }
    assert(!rows(1).isNullAt(1) &&
      rows(1).getSeq[Any](1).forall(_ == null),
      "empty hash array must give all-null signature elements")
    assert(!rows(2).isNullAt(1) &&
      rows(2).getSeq[Any](1).forall(_ == null),
      "null array must give an all-null-element signature (like the HOF)")
  }
}
