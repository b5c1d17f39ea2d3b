package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized cross-checks of the distributed operators against small
  * INDEPENDENT reference implementations (straightforward single-node
  * Scala, no shared code paths) — the same oracle idea as the DuckDB
  * gate, but exercising arbitrary corpora instead of the fixtures.
  * Fixed seeds keep CI deterministic.
  */
class ReferenceCrossSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference BPE (greedy left-to-right, (cnt DESC, l, r) ties) ----
  private def refBpe(wf: Map[String, Long],
      n: Int): List[(Long, String, String, String, Long)] = {
    var repr: List[(List[String], Long)] =
      wf.toList.map { case (w, f) => (w.map(_.toString).toList :+ "$", f) }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      repr.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toList
          .sortBy { case ((l0, r0), c0) => (-c0, l0, r0) }.head
        out += ((step.toLong, l, r, l + r, c))
        repr = repr.map { case (syms, f) =>
          val acc = scala.collection.mutable.ListBuffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc(acc.length - 1) = l + r
            else acc += s
          }
          (acc.toList, f)
        }
        step += 1
      }
    }
    out.toList
  }

  test("bpe merges match the reference on random corpora") {
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { _ =>
      val words = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString
      }
      val wf = words.groupBy(identity).map { case (w, g) =>
        w -> (g.size * (1L + rnd.nextInt(5)))
      }
      val engine = Bpe.merges(spark, wf.toSeq.toDF("word", "freq"), 8)
        .as[(Long, String, String, String, Long)].collect().toList
      assert(engine == refBpe(wf, 8))
    }
  }

  test("repeated-span stats match brute force on random corpora") {
    val rnd = new scala.util.Random(11L)
    val k = 4
    (1 to 3).foreach { _ =>
      val docs = (0 until 12).map { i =>
        val len = rnd.nextInt(20)
        (i.toLong,
          (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }
      val grams = docs.flatMap { case (_, t) =>
        (0 to t.length - k).map(p => t.substring(p, p + k))
      }.groupBy(identity).map { case (g, o) => g -> o.size }
      val expect = docs.map { case (id, t) =>
        val ps = (0 to t.length - k).map(p => t.substring(p, p + k))
        val nd = ps.count(g => grams(g) >= 2)
        id -> ((ps.size.toLong, nd.toLong))
      }.toMap
      val engine = Dedup.repeatedSpanStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .select($"id", $"n_pos", $"n_dup")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      expect.foreach { case (id, (np, ndup)) =>
        assert(engine(id) == ((np, ndup)), s"doc $id")
      }
    }
  }

  test("hits matches a dense reference iteration on random graphs") {
    val rnd = new scala.util.Random(13L)
    (1 to 3).foreach { _ =>
      val nv = 6
      val edges = (1 to 12).map(_ =>
        (rnd.nextInt(nv).toLong, rnd.nextInt(nv).toLong))
        .filter { case (a, b) => a != b }.distinct
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      var h = verts.map(_ -> 1.0 / math.sqrt(verts.size.toDouble)).toMap
      var a = h
      def norm(m: Map[Long, Double]) = {
        val n = math.sqrt(m.values.map(x => x * x).sum)
        m.map { case (k, v) => k -> v / n }
      }
      (1 to 3).foreach { _ =>
        a = norm(verts.map(v => v ->
          edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap)
        h = norm(verts.map(v => v ->
          edges.filter(_._1 == v).map(e => a(e._2)).sum).toMap)
      }
      val engine = Hits.hits(edges.toDF("src", "dst"), iters = 3)
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      verts.foreach { v =>
        assert(math.abs(engine(v)._1 - h(v)) < 1e-6, s"hub $v")
        assert(math.abs(engine(v)._2 - a(v)) < 1e-6, s"auth $v")
      }
    }
  }
}
