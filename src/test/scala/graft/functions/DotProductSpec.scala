package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DotProduct / SqDist — the fused codegen'd embedding inner loops.
  * Pins the bit-compatibility contract their docs promise: results are
  * BIT-EQUAL (java.lang.Double.doubleToRawLongBits) to the
  * aggregate-over-zip_with compositions they replace, including the
  * null/mismatch corners, so swapping them into Similarity.dot/sqDist
  * cannot move any oracle hash.
  */
class DotProductSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def hofSqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  private def fused(name: String, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      if (name == "dot") DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b))
      else SqDist(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  test("bit-equal to the HOF composition on real embedding pairs") {
    import spark.implicits._
    val v = graft.tables.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id".as("id"),
        graft.operators.Similarity.toDouble($"embedding").as("vec"))
    val pairs = v.crossJoin(v.select($"id".as("id2"), $"vec".as("vec2")))
      .filter($"id" < 40 && $"id2" < 40)
      .select(
        fused("dot", $"vec", $"vec2").as("fd"),
        hofDot($"vec", $"vec2").as("hd"),
        fused("sq", $"vec", $"vec2").as("fs"),
        hofSqDist($"vec", $"vec2").as("hs"))
      .collect()
    assert(pairs.length == 1600)
    pairs.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"dot: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"sqDist: $r")
    }
  }

  test("null/mismatch corners mirror the composition") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // plain
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),        // length mismatch
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])), // both empty
      (None, Some(Seq(1.0)))                        // null array
    ).toDF("a", "b")
    val rows = df.select(
      fused("dot", $"a", $"b").as("fd"), hofDot($"a", $"b").as("hd"),
      fused("sq", $"a", $"b").as("fs"), hofSqDist($"a", $"b").as("hs"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot nullness: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"dot: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"sqDist nullness: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"sqDist: $r")
    }
    // the mismatch/null rows really are null (not silently 0)
    assert(rows(1).isNullAt(0) && rows(3).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("null ELEMENT yields null like the composition") {
    import spark.implicits._
    val df = spark.sql(
      "SELECT array(1.0d, cast(null as double)) AS a, array(2.0d, 3.0d) AS b")
    val r = df.select(
      fused("dot", col("a"), col("b")).as("fd"),
      hofDot(col("a"), col("b")).as("hd")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
