package graft.operators

import graft.SparkSpec
import graft.queries.DedupQueries

/** Invariants for the dedup threshold-yield sweep (d17). The streaming
  * top-k (sm10) is gate-checked against its batch oracle; d17's curve
  * shape is pinned here.
  */
class YieldTopkSpec extends SparkSpec {

  test("d17 yield curve is monotone in the threshold") {
    val q = DedupQueries.all.find(_.name == "d17_threshold_yield").get
    val rows = q.run(spark, sf("sf0.001")).collect()
    assert(rows.length == 7)
    val byT = rows.sortBy(_.getDouble(0))
    // raising the threshold can only shrink the qualifying pair set,
    // the removed set, and therefore grow the survivor set
    val pairs = byT.map(_.getLong(1))
    val removed = byT.map(_.getLong(2))
    val survivors = byT.map(_.getLong(3))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(removed.zip(removed.tail).forall { case (a, b) => a >= b })
    assert(survivors.zip(survivors.tail).forall { case (a, b) => a <= b })
    // removed + survivors is the constant slice size
    val totals = byT.map(r => r.getLong(2) + r.getLong(3)).distinct
    assert(totals.length == 1)
    assert(removed.zip(pairs).forall { case (r, p) => r <= p })
  }
}
