package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.queries.{AnalysisQueries, TemporalQueries}

/** Invariants for the halving EMA (q50) and scene-cut rollup (mm07).
  * Values are oracle-checked by the gate; these pin the math a user
  * depends on.
  */
class EmaSceneSpec extends SparkSpec {
  import spark.implicits._

  test("zero-seeded halving EMA of a constant stream is v*(1-2^-n)") {
    // s_n = (s_{n-1} + v)/2 from s_0 = 0 has closed form v*(1 - 2^-n);
    // with v a power of two every step is exact.
    val v = 4.0
    val ema = (1 to 10).foldLeft(0.0)((s, _) => (s + v) / 2)
    assert(ema == v * (1 - math.pow(2.0, -10)))
  }

  test("q50 row-level consistency on the fixture") {
    val q = TemporalQueries.all.find(_.name == "q50_ema").get
    val rows = q.run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0) // every grouped user has events
      assert(!r.getDouble(2).isNaN)
    }
  }

  test("mm07 cut counts and runs are internally consistent") {
    val q = AnalysisQueries.all.find(_.name == "mm07_scene_cuts").get
    val rows = q.run(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(_, nFrames: Long, nCuts: Long, rate: Double, maxRun: Long) =>
      assert(nFrames > 1)
      assert(nCuts >= 0 && nCuts <= nFrames - 1)
      // the longest static run can't exceed the frame count, and with c
      // cuts there are c+1 runs so the longest is at least nFrames/(c+1)
      assert(maxRun >= 1 && maxRun <= nFrames)
      assert(maxRun * (nCuts + 1) >= nFrames)
      assert(math.abs(rate - math.round(nCuts * 1.0 / (nFrames - 1) * 1e6) / 1e6) < 1e-9)
    }
  }
}
