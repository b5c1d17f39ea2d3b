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
}
