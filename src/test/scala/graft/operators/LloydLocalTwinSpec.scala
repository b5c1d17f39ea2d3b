package graft.operators

import graft.SparkSpec

/** Pins the r15 routing contract of [[Similarity.lloydClusters]]: the
  * bounded-collect local twin must be BIT-identical to the distributed
  * window+decimal-agg loop — centroid coordinates and assignments
  * compared with ==, never a tolerance. The fixture deliberately
  * includes duplicate vectors (argmin ties → lowest cluster), a vector
  * equidistant from two centroids, and a cluster that goes empty after
  * round 1 (keep-previous-centroid rule).
  */
class LloydLocalTwinSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(0.0, 0.0)),
    (1L, Seq(10.0, 10.0)),
    (2L, Seq(0.1, -0.2)),
    (3L, Seq(9.8, 10.3)),
    (4L, Seq(5.0, 5.0)),   // equidistant-ish between the two blobs
    (5L, Seq(0.1, -0.2)),  // duplicate of id 2
    (6L, Seq(10.0, 10.0)), // duplicate of id 1
    (7L, Seq(0.05, 0.05))
  ).toDF("id", "vec")

  private def run(maxLocalRows: Int) = {
    val (cents, asg) = Similarity.lloydClusters(vecs, 3, 2, maxLocalRows)
    val c = cents.orderBy("cluster")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
    val a = asg.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getInt(2)))
      .toSeq
    (c, a)
  }

  test("local twin is bit-identical to the distributed loop") {
    val (cLocal, aLocal) = run(maxLocalRows = 200000) // local route
    val (cDist, aDist) = run(maxLocalRows = -1)        // forces the DF route
    assert(cLocal == cDist)
    assert(aLocal == aDist)
    assert(cLocal.size == 3 && aLocal.size == 8)
  }

  test("ivfadc consumer runs deterministically on the local route") {
    // the heaviest lloyd consumer: full IVFADC over the same fixture
    // (route equality is pinned above at the lloydClusters surface —
    // the consumer only reads the returned DataFrames)
    val qs = Seq((100L, Seq(0.2, 0.1)), (101L, Seq(9.9, 10.1)))
      .toDF("qid", "vec")
    def rows() = {
      val r = Similarity.ivfAdcTopK(vecs, qs, k = 2, nClusters = 2,
        nProbe = 2, coarseIters = 2, m = 2, subDim = 1, pqClusters = 2,
        pqIters = 2)
      r.orderBy(r.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        .collect().map(_.toSeq).toSeq
    }
    val a = rows(); val b = rows()
    assert(a == b && a.nonEmpty)
  }
}
