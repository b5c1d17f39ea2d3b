package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel sequencing and cohort retention on hand-computed fixtures. */
class BehaviorSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")
  }

  test("funnel requires steps strictly in order") {
    import spark.implicits._
    val ev = eventsDf(
      // user 1: full ordered funnel
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 11:00:00"),
      (1L, "purchase", "2026-01-01 12:00:00"),
      // user 2: click BEFORE the first view -> step 2 not reached
      (2L, "click", "2026-01-02 09:00:00"),
      (2L, "view", "2026-01-02 10:00:00"),
      // user 3: enters, never clicks
      (3L, "view", "2026-01-03 08:00:00"),
      // user 4: never views -> not in the funnel at all
      (4L, "purchase", "2026-01-04 08:00:00"))
    val out = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy($"user_id")
      .select($"user_id", $"t1", $"t2", $"t3")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp])].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._3.contains(ts("2026-01-01 11:00:00")) &&
      out(0)._4.contains(ts("2026-01-01 12:00:00")))
    assert(out(1)._3.isEmpty && out(1)._4.isEmpty)
    assert(out(2)._3.isEmpty && out(2)._4.isEmpty)
  }

  test("funnel picks the EARLIEST qualifying event per step") {
    import spark.implicits._
    val ev = eventsDf(
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "click", "2026-01-01 10:30:00"),
      (1L, "click", "2026-01-01 11:00:00"))
    val out = Behavior.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click")).select($"t2").as[Timestamp].head()
    assert(out == ts("2026-01-01 10:30:00"))
  }

  test("retention counts cohort members by day offset") {
    import spark.implicits._
    val ev = eventsDf(
      // cohort 2026-01-01: users 1, 2
      (1L, "view", "2026-01-01 10:00:00"),
      (2L, "view", "2026-01-01 11:00:00"),
      (1L, "click", "2026-01-02 10:00:00"), // u1 back on day 1
      (2L, "click", "2026-01-03 10:00:00"), // u2 back on day 2
      (1L, "view", "2026-01-03 09:00:00"), // u1 also day 2
      // cohort 2026-01-02: user 3, never returns
      (3L, "view", "2026-01-02 12:00:00"))
    val out = Behavior.retention(ev, "user_id", "ts", 7)
      .orderBy($"cohort_day", $"offset")
      .select($"cohort_day".cast("string"), $"offset", $"n_users")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("2026-01-01", 0L, 2L), // both seen on their first day
      ("2026-01-01", 1L, 1L), // u1
      ("2026-01-01", 2L, 2L), // u1 + u2
      ("2026-01-02", 0L, 1L)))
  }

  test("retention drops offsets beyond the horizon") {
    import spark.implicits._
    val ev = eventsDf(
      (1L, "view", "2026-01-01 10:00:00"),
      (1L, "view", "2026-03-01 10:00:00"))
    val out = Behavior.retention(ev, "user_id", "ts", 7)
      .select($"offset").as[Long].collect()
    assert(out.toSeq == Seq(0L))
  }
}
