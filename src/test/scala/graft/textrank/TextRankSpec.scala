package graft.textrank

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private val log2 = (x: Double) => math.log(x) / math.log(2)

  // 3-vertex micro graph, hand-checkable (SURVEY §5.2: one iteration
  // against hand-computed contributions).
  private val vertices = Seq(
    (0L, Seq("x", "x", "y")), // len 3 (duplicates count toward log2 length)
    (1L, Seq("x", "z")),
    (2L, Seq("y", "z"))).toDF("id", "tokens")

  private val simAB = 1.0 / (log2(3) + log2(2) + 1) // {x}
  private val simAC = 1.0 / (log2(3) + log2(2) + 1) // {y}
  private val simBC = 1.0 / (log2(2) + log2(2) + 1) // {z}

  test("similarity uses duplicate lengths but set intersection (G2)") {
    val e = TextRank.similarityEdges(vertices)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(e.size == 6) // both directions, no self edges
    assert(math.abs(e((0L, 1L)) - simAB) < 1e-12)
    assert(math.abs(e((1L, 0L)) - simAB) < 1e-12)
    assert(math.abs(e((1L, 2L)) - simBC) < 1e-12)
  }

  test("one rank iteration matches hand-computed contributions (G5/G6)") {
    val r = TextRank.ranks(TextRank.similarityEdges(vertices),
      TextRank.Config(iterations = 1))
      .as[(Long, Double)].collect().toMap
    val owA = simAB + simAC
    val owB = simAB + simBC
    val owC = simAC + simBC
    val expA = 0.15 + 0.85 * (0.15 * simAB / owB + 0.15 * simAC / owC)
    val expB = 0.15 + 0.85 * (0.15 * simAB / owA + 0.15 * simBC / owC)
    assert(math.abs(r(0L) - expA) < 1e-12)
    assert(math.abs(r(1L) - expB) < 1e-12)
  }

  test("ranks stay >= initRank and converge over 5 iterations") {
    val r = TextRank.ranks(TextRank.similarityEdges(vertices))
      .as[(Long, Double)].collect().toMap
    assert(r.size == 3)
    assert(r.values.forall(_ >= 0.15))
  }

  test("shuffled fallback (broadcastLimit=0) matches the broadcast path") {
    val broadcasted = TextRank.ranks(TextRank.similarityEdges(vertices))
      .as[(Long, Double)].collect().toMap
    val shuffled = TextRank.ranks(TextRank.similarityEdges(vertices),
      TextRank.Config(broadcastLimit = 0L))
      .as[(Long, Double)].collect().toMap
    assert(broadcasted.keySet == shuffled.keySet)
    broadcasted.foreach { case (id, v) =>
      assert(math.abs(v - shuffled(id)) < 1e-12, s"vertex $id")
    }
  }

  test("directed edge list: sink-only vertices ranked, both paths agree") {
    // 0→1→2 chain plus 0→2: vertex 2 never appears as src (pure sink),
    // vertex 0 never as dst (pure source). The public ranks() API must
    // neither NPE (old src-only index) nor drop vertices, and the
    // aggregated and shuffled strategies must produce identical output.
    val directed = Seq(
      (0L, 1L, 1.0),
      (1L, 2L, 2.0),
      (0L, 2L, 3.0)).toDF("src", "dst", "weight")
    val agg = TextRank.ranks(directed, TextRank.Config(iterations = 2))
      .as[(Long, Double)].collect().toMap
    val shf = TextRank.ranks(directed,
      TextRank.Config(iterations = 2, broadcastLimit = 0L))
      .as[(Long, Double)].collect().toMap
    assert(agg.keySet == Set(0L, 1L, 2L))
    assert(shf.keySet == Set(0L, 1L, 2L))
    // Source-only vertex holds initRank; hand-check the chain after two
    // iterations: r1 = .15 + .85*(r0 * 1/4); r2 uses iteration-1 ranks.
    val r1i1 = 0.15 + 0.85 * (0.15 * 0.25)
    assert(math.abs(agg(0L) - 0.15) < 1e-12)
    assert(math.abs(agg(1L) - r1i1) < 1e-12) // r0 constant → r1 fixed point
    val r2i2 = 0.15 + 0.85 * (0.15 * 0.75 + r1i1 * 1.0)
    assert(math.abs(agg(2L) - r2i2) < 1e-12)
    agg.foreach { case (id, v) =>
      assert(math.abs(v - shf(id)) < 1e-12, s"vertex $id: $v vs ${shf(id)}")
    }
  }

  test("quadratic byte estimates saturate instead of wrapping (overflow guard)") {
    // nv ≳ 4.4e8: a plain nv²·48 wraps negative and would silently
    // disengage the DISK_ONLY flip at exactly the corpus scales it
    // protects (round-11 advice). The saturating helpers stay monotone.
    val nv = 500000000L // 5e8 vertices: nv²·48 ≫ Long.MaxValue
    assert(nv * nv * 48L < 0L) // the bug being guarded against is real
    assert(TextRank.quadEdgeBytes(nv) == Long.MaxValue)
    assert(TextRank.quadEdgeBytes(nv) > TextRank.DiskEdgeBytes)
    assert(TextRank.satMul(0L, 48L) == 0L)
    assert(TextRank.satMul(6700L, 6700L) == 6700L * 6700L) // exact below
    assert(TextRank.quadEdgeBytes(6700L) == 6700L * 6700L * 48L)
    // monotone across the old wrap point
    assert(TextRank.quadEdgeBytes(nv) >= TextRank.quadEdgeBytes(440000000L))
  }

  test("ranks with a proven-small edge bound matches the counted path") {
    // maxDirectedEdges below both the edge budget and the DISK_ONLY
    // threshold skips the stateless pre-count (the tr02 bench reclaim);
    // the result must be identical to the counting path.
    val e = TextRank.similarityEdges(vertices)
    val counted = TextRank.ranks(e).as[(Long, Double)].collect().toMap
    val bounded = TextRank.ranks(e, maxDirectedEdges = 9L)
      .as[(Long, Double)].collect().toMap
    assert(counted.keySet == bounded.keySet)
    counted.foreach { case (id, v) =>
      assert(v == bounded(id), s"vertex $id") // bit-identical, same route
    }
  }

  test("similarityEdges with an explicit vertexCount matches the counting path") {
    val a = TextRank.similarityEdges(vertices)
      .as[(Long, Long, Double)].collect().toSet
    val b = TextRank.similarityEdges(vertices, vertexCount = 3L)
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("rankDocuments applies the exclusive 10..30 word band (F2)") {
    val docs = Seq(
      (0L, ("alpha beta " * 8).trim), // 16 words, in band
      (1L, ("alpha beta " * 20).trim), // 40 words, out
      (2L, "alpha beta gamma"), // 3 words, out
      (3L, ("beta gamma " * 7).trim) // 14 words, in band
    ).toDF("doc_id", "text")
    val r = TextRank.rankDocuments(docs, "doc_id", "text",
      TextRank.Config(lemma = false))
      .select($"id").as[Long].collect().toSet
    assert(r == Set(0L, 3L))
  }
}
