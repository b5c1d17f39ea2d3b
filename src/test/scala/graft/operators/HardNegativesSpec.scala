package graft.operators

import graft.SparkSpec

/** Similarity.hardNegatives (s18): different-label-only neighbors with
  * a false-negative cosine margin.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // label 0 cluster around e1, label 1 cluster around e2, plus a
  // cross-labeled near-duplicate of the query (the false negative the
  // margin must drop)
  private val vs = Seq(
    (0L, Seq(1.0, 0.0, 0.0), 0),
    (1L, Seq(0.9, 0.1, 0.0), 0),
    (2L, Seq(0.0, 1.0, 0.0), 1),
    (3L, Seq(0.1, 0.9, 0.0), 1),
    (4L, Seq(1.0, 0.001, 0.0), 1) // near-dup of 0 with the wrong label
  ).toDF("id", "vec", "label")

  test("negatives are different-label only, margin drops near-dups") {
    val out = Similarity.hardNegatives(vs, vs.filter($"id" === 0L),
        k = 5, maxCos = 0.99)
      .collect().map(r => (r.getLong(2), r.getInt(1), r.getDouble(3)))
    val ids = out.map(_._1)
    assert(!ids.contains(1L)) // same label excluded
    assert(!ids.contains(4L)) // cosine ~0.9999995 >= margin: dropped
    assert(ids.toList == List(3L, 2L)) // hardest (most similar) first
    assert(out.map(_._2).toList == List(1, 2))
  }
}
