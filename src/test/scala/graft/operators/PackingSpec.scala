package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Packing.contextPack invariants: per-shard offsets are an exact
  * exclusive prefix sum in hash order, windows are offset div ctx, the
  * assignment is a pure function of the id (stable under repartition),
  * and bad configs fail loudly.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 200L).map(i => (i, 10 + (i % 37)))
    .toDF("doc_id", "n")

  test("per-shard exclusive prefix sums and window ids") {
    val out = Packing.contextPack(docs, "doc_id", $"n", ctx = 128L, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 200)
    assert(out.map(_._2).distinct.sorted.forall(s => s >= 0 && s < 4))
    // Re-derive each shard's expected offsets from the same hash order.
    val byShard = out.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      // hash order == ascending start_offset within the shard
      val sorted = rows.sortBy(_._4)
      var acc = 0L
      sorted.foreach { case (_, _, n, off, win) =>
        assert(off == acc, s"offset $off != prefix sum $acc")
        assert(win == off / 128L)
        acc += n
      }
    }
    // Offsets within a shard are unique (no two docs share a start).
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._4).distinct.length == rows.length, s"shard $s")
    }
  }

  test("assignment is a pure function of the id: stable under repartition") {
    val a = Packing.contextPack(docs, "doc_id", $"n", 128L, 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(3))).toMap
    val b = Packing.contextPack(docs.repartition(7), "doc_id", $"n", 128L, 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(3))).toMap
    assert(a == b)
  }

  test("non-power-of-two shards and non-positive ctx are rejected") {
    intercept[IllegalArgumentException] {
      Packing.contextPack(docs, "doc_id", $"n", 128L, shards = 6)
    }
    intercept[IllegalArgumentException] {
      Packing.contextPack(docs, "doc_id", $"n", ctx = 0L, shards = 4)
    }
  }

  test("noSplitPack: sequences respect the budget (except oversized " +
    "singletons) and break exactly on overflow") {
    import spark.implicits._
    // token counts spanning under/over budget 50, incl. an oversized doc
    val dd = (1L to 40L).map(id => (id, s"${"w " * (7 + (id * 11 % 60).toInt)}"))
      .toDF("doc_id", "text")
    val out = SentenceChunks.noSplitPack(dd,
        graft.operators.TextAnalysis.wsTokenCount($"text"), budget = 50L,
        shards = 4)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 40)
    out.groupBy(t => (t._1, t._3)).foreach { case ((sh, seq), rows) =>
      val total = rows.map(_._4).sum
      assert(total <= 50L || rows.length == 1,
        s"shard $sh seq $seq holds $total tokens in ${rows.length} docs")
    }
    // greedy = a new sequence starts ONLY when the previous had no room
    out.groupBy(_._1).foreach { case (sh, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, p2, s2, n2)) =>
          if (s2 == s1 + 1) {
            val used = ordered.filter(t => t._3 == s1).map(_._4).sum
            assert(used + n2 > 50L,
              s"shard $sh pos $p2 broke with room left ($used + $n2)")
          } else assert(s2 == s1, s"shard $sh seq ids not contiguous")
        case _ =>
      }
    }
  }
}
