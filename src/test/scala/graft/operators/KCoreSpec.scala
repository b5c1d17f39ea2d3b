package graft.operators

import graft.SparkSpec

/** Dedup.kCore — pins the peeling semantics on known graphs: a
  * triangle with a pendant tail (tail peels, triangle stays), a pure
  * chain (unravels COMPLETELY, which takes multiple rounds — the case
  * a single-pass degree filter gets wrong), and convergence (extra
  * rounds change nothing once the core is stable).
  */
class KCoreSpec extends SparkSpec {

  private def core(edges: Seq[(Long, Long)], rounds: Int = 4): Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    Dedup.kCore(edges.toDF("a", "b"), k = 2, rounds = rounds)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("degree0"), r.getAs[Boolean]("in_core")))
      .toMap
  }

  test("triangle survives, pendant tail peels") {
    // 1-2-3 triangle, tail 3-4-5
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = core(g)
    assert(got(1L) == ((2L, true)) && got(2L) == ((2L, true)))
    assert(got(3L) == ((3L, true)), "triangle vertex with tail stays in core")
    assert(!got(4L)._2 && !got(5L)._2, "tail must peel")
  }

  test("a chain unravels completely even though inner nodes start at degree 2") {
    // 1-2-3-4-5: after round 1 the ends drop, cascading inward
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = core(g)
    assert(got.values.forall(!_._2), s"chain left a core: $got")
    assert(got(3L)._1 == 2L, "inner chain node starts at degree 2")
  }

  test("peeling is converged at the gate round count") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (7L, 8L))
    val r4 = core(g, rounds = 4)
    val r7 = core(g, rounds = 7)
    assert(r4 == r7, "extra rounds changed the core - not converged at 4")
  }
}
