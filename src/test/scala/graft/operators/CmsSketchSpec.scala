package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch invariants (the oracle gate pins exact cell values;
  * these pin the sketch-theoretic structure on arbitrary data).
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 16

  private lazy val items =
    (1 to 500).map(i => s"k${i % 37}").toDF("k")

  private lazy val sketch = CmsSketch.sketchTable(items, $"k", depth, width)

  test("grid is complete: depth x width cells, each depth row sums to n") {
    val cells = sketch.collect()
    assert(cells.length == depth * width)
    val perDepth = sketch.groupBy($"d").agg(sum($"cnt").as("s"))
      .collect().map(r => r.getAs[Long]("s")).toSeq
    assert(perDepth == Seq.fill(depth)(500L))
  }

  test("estimate is an upper bound on the true count, exact when no collision") {
    val truth = items.groupBy($"k".as("key")).agg(count(lit(1)).as("t"))
    val est = CmsSketch.estimates(sketch, items.distinct(), $"k", depth, width)
    val joined = est.join(truth, "key")
      .select($"key", $"est", $"t").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("t"),
        s"CMS underestimated ${r.getAs[String]("key")}")
    }
  }

  test("unseen keys read a nonnegative (possibly colliding) estimate") {
    val unseen = Seq("nope1", "nope2").toDF("k")
    val est = CmsSketch.estimates(sketch, unseen, $"k", depth, width)
      .collect().map(_.getAs[Long]("est"))
    assert(est.length == 2 && est.forall(_ >= 0))
  }

  test("sketch of a disjoint union equals cellwise sum of sketches (mergeable)") {
    val a = (1 to 100).map(i => s"a$i").toDF("k")
    val b = (1 to 80).map(i => s"b$i").toDF("k")
    val merged = CmsSketch.sketchTable(a.union(b), $"k", depth, width)
    val summed = CmsSketch.sketchTable(a, $"k", depth, width)
      .union(CmsSketch.sketchTable(b, $"k", depth, width))
      .groupBy($"d", $"bucket").agg(sum($"cnt").as("cnt"))
    assert(merged.join(summed, Seq("d", "bucket"))
      .filter(merged("cnt") =!= summed("cnt")).count() == 0)
  }
}
