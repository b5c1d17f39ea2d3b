package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AsofJoin / RangeJoin semantics on hand-computed fixtures, plus
  * equivalence of the bucketized range join against the naive
  * cross-product formulation it replaces.
  */
class TemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asofBackward picks the latest at-or-before right row per key") {
    val left = Seq(
      (1L, 10L, 100L), // key 10, t=100
      (2L, 10L, 205L),
      (3L, 20L, 50L), // key 20: no right row at or before 50
      (4L, 30L, 400L) // key 30: no right rows at all
    ).toDF("lid", "k", "t")
    val right = Seq(
      (101L, 10L, 100L, 1.5), // exactly at left t=100 → counts (≤)
      (102L, 10L, 200L, 2.5),
      (103L, 10L, 300L, 3.5), // after every left row of key 10
      (104L, 20L, 60L, 4.5)
    ).toDF("rid", "k", "t", "v")

    val out = AsofJoin.asofBackward(left, right,
      leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
      payload = Seq("rid", "v"), rightTie = "rid")
      .select($"lid", $"asof_rid", $"asof_v")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

    assert(out === Set(
      (1L, Some(101L), Some(1.5)),
      (2L, Some(102L), Some(2.5)),
      (3L, None, None),
      (4L, None, None)))
  }

  test("asofBackward breaks equal-timestamp ties to the greatest tie key") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "t")
    val right = Seq(
      (11L, 7L, 100L, 1.0),
      (19L, 7L, 100L, 2.0), // same ts — greatest rid wins
      (15L, 7L, 100L, 3.0)
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofBackward(left, right,
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"asof_rid").as[Long].collect().toSeq
    assert(out === Seq(19L))
  }

  test("asofBackward never matches null keys or times (SQL join semantics)") {
    val left = Seq(
      (1L, Some(5L), Some(100L)),
      (2L, None, Some(100L)), // null key: no match possible
      (3L, Some(5L), None) // null time: comparison is null, no match
    ).toDF("lid", "k", "t")
    val right = Seq(
      (11L, Some(5L), Some(50L), 1.0),
      (12L, None, Some(40L), 2.0), // null-key right row must not be carried
      (13L, Some(5L), None, 3.0) // null-time right row must not be carried
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofBackward(left, right,
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(out === Map(1L -> Some(11L), 2L -> None, 3L -> None))
  }

  test("asofBackward equals the naive per-left top-1 on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 400).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toDouble))
    val out = AsofJoin.asofBackward(
      left.toDF("lid", "k", "t"), right.toDF("rid", "k", "t", "v"),
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    left.foreach { case (lid, k, t) =>
      val naive = right.filter(r => r._2 == k && r._3 <= t)
        .sortBy(r => (r._3, r._1)).lastOption.map(_._1)
      assert(out(lid) === naive, s"lid=$lid")
    }
  }

  test("asof joins work on string keys and reject mismatched key types") {
    // String keys must join natively (they used to be cast to long →
    // NULL → every left row silently unmatched).
    val left = Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("lid", "k", "t")
    val right = Seq((11L, "a", 50L, 1.0)).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofBackward(left, right,
      "k", "k", "t", "t", Seq("v"), "rid")
      .select($"lid", $"asof_v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out === Set((1L, Some(1.0)), (2L, None)))

    // Mismatched key types fail loudly instead of returning no matches.
    val badRight = Seq((11L, 7L, 50L, 1.0)).toDF("rid", "k", "t", "v")
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, badRight, "k", "k", "t", "t", Seq("v"), "rid")
    }
    assert(err.getMessage.contains("key types must match"))

    // Non-integral tie column is rejected too.
    val err2 = intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left.withColumn("k", $"lid"), badRight,
        "k", "k", "t", "t", Seq("v"), rightTie = "v")
    }
    assert(err2.getMessage.contains("integral"))
  }

  test("asofForward picks the earliest at-or-after right row per key") {
    val left = Seq(
      (1L, 10L, 100L), // exact-time right row counts (≥)
      (2L, 10L, 250L),
      (3L, 10L, 350L), // after every right row of key 10
      (4L, 30L, 400L) // key 30: no right rows at all
    ).toDF("lid", "k", "t")
    val right = Seq(
      (101L, 10L, 100L, 1.5),
      (102L, 10L, 200L, 2.5),
      (103L, 10L, 300L, 3.5)
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofForward(left, right,
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(out === Map(
      1L -> Some(101L), 2L -> Some(103L), 3L -> None, 4L -> None))
  }

  test("asofForward breaks equal-timestamp ties to the smallest tie key") {
    val left = Seq((1L, 7L, 100L)).toDF("lid", "k", "t")
    val right = Seq(
      (19L, 7L, 100L, 1.0),
      (11L, 7L, 100L, 2.0), // same ts — smallest rid wins
      (15L, 7L, 100L, 3.0)
    ).toDF("rid", "k", "t", "v")
    val out = AsofJoin.asofForward(left, right,
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"asof_rid").as[Long].collect().toSeq
    assert(out === Seq(11L))
  }

  test("asofForward equals the naive per-left top-1 on random data") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 400).map(i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toDouble))
    val out = AsofJoin.asofForward(
      left.toDF("lid", "k", "t"), right.toDF("rid", "k", "t", "v"),
      "k", "k", "t", "t", Seq("rid", "v"), "rid")
      .select($"lid", $"asof_rid")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    left.foreach { case (lid, k, t) =>
      val naive = right.filter(r => r._2 == k && r._3 >= t)
        .sortBy(r => (r._3, r._1)).headOption.map(_._1)
      assert(out(lid) === naive, s"lid=$lid")
    }
  }

  test("bucketized interval join equals the naive range predicate") {
    val rnd = new scala.util.Random(42)
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(500))
    }.toDF("iid", "lo", "hi")
    val points = (1 to 1000).map(j => (j.toLong, rnd.nextInt(11000).toLong))
      .toDF("pid", "pt")

    for (width <- Seq(64L, 250L, 1000L); inc <- Seq(false, true)) {
      val fast = RangeJoin.intervalJoin(intervals, "lo", "hi", points, "pt",
        bucketWidth = width, hiInclusive = inc)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      val bound = if (inc) points("pt") <= intervals("hi")
        else points("pt") < intervals("hi")
      val naive = intervals.crossJoin(points)
        .filter(points("pt") >= intervals("lo") && bound)
        .select($"iid", $"pid").as[(Long, Long)].collect().toSet
      assert(fast === naive, s"width=$width inclusive=$inc")
    }
  }

  test("interval join emits each qualifying pair exactly once") {
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "lo", "hi") // spans many buckets
    val points = Seq((1L, 500L)).toDF("pid", "pt")
    val out = RangeJoin.intervalJoin(intervals, "lo", "hi", points, "pt", 10L)
    assert(out.count() === 1L)
  }
}
