package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.IntersectSize.intersect_size

class IntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq("a", "a", "b"), Seq("a", "x")), // duplicates count once
    (Seq.empty[String], Seq("a")),
    (Seq("x"), Seq.empty[String]),
    (Seq("q", "w"), Seq("q", "w"))).toDF("a", "b")

  test("matches size(array_intersect) on distinct and duplicate inputs") {
    val rows = df.select(
      intersect_size($"a", $"b").as("fused"),
      size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Int, Int)].collect()
    rows.foreach { case (f, bi) => assert(f == bi, rows.mkString(",")) }
    assert(rows.map(_._1).toSeq == Seq(2, 1, 0, 0, 2))
  }

  test("null ELEMENTS follow array_intersect: shared null counts once") {
    val nd = Seq(
      (Seq("a", null, "b"), Seq(null, "b", "c")), // shared null + b → 2
      (Seq("a", null, null), Seq(null, null)),    // nulls dedup to one → 1
      (Seq("a", null), Seq("a", "c")),            // null only on one side → 1
      (Seq[String](null), Seq[String](null)))     // only a shared null → 1
      .toDF("a", "b")
    val rows = nd.select(
      intersect_size($"a", $"b").as("fused"),
      size(array_intersect($"a", $"b")).as("builtin"))
      .as[(Int, Int)].collect()
    rows.foreach { case (f, bi) => assert(f == bi, rows.mkString(",")) }
    assert(rows.map(_._1).toSeq == Seq(2, 1, 1, 1))
  }

  test("null array yields null (NullIntolerant binary expression)") {
    val r = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b")
      .select(intersect_size($"a", $"b"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("survives whole-stage codegen in a join context") {
    val big = (0 until 100).map(i => (i.toLong, Seq("t" + (i % 7), "u" + (i % 3)))).toDF("id", "toks")
    val out = big.as("x").join(big.as("y"), $"x.id" < $"y.id")
      .select(intersect_size($"x.toks", $"y.toks").as("c"))
      .agg(sum($"c")).as[Long].head()
    val ref = big.as("x").join(big.as("y"), $"x.id" < $"y.id")
      .select(size(array_intersect($"x.toks", $"y.toks")).as("c"))
      .agg(sum($"c")).as[Long].head()
    assert(out == ref)
  }
}
