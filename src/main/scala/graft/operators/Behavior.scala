package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics (SURVEY §7.5): ordered funnels and
  * cohort retention — the two queries every product-events warehouse
  * runs daily, shaped so each stage is a per-user hash aggregation.
  */
object Behavior {

  /** Ordered funnel: for each user, the earliest time of step 1, then
    * the earliest step-2 event STRICTLY AFTER it, and so on — a user
    * "reaches" step i only if the steps happened in order. Users who
    * stall keep nulls for the unreached steps (left joins), so step
    * conversion is `count(t_i is not null)` downstream.
    *
    * Scale shape: one pass per step, each a filter on the (pushed-down)
    * event type + a per-user hash aggregation; the running frontier
    * table carries one row per user who entered the funnel, so joins
    * after step 1 are frontier-sized, not corpus-sized. No windows, no
    * per-user sorting — `min(when(ts > t_prev))` does the sequencing.
    *
    * Output: (userCol, t1 .. t<steps.length>) for users with a step-1
    * event.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val user = col(userCol)
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(user).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = col(s"t$i")
      val carried = col(userCol) +: (1 to i).map(j => col(s"t$j"))
      acc = acc
        .join(events.filter(col(typeCol) === step)
          .select(user, col(tsCol).as("__ts")), Seq(userCol), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__ts") > prev, col("__ts"))).as(s"t${i + 1}"))
    }
    acc
  }

  /** Cohort retention: users are grouped by the day of their first
    * event (their cohort); a cohort's offset-d cell counts members
    * active d days later. Two per-user hash aggregations (first day +
    * distinct active days) joined on user, then one (cohort, offset)
    * count — all integer/date arithmetic, no windows.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      maxOffsetDays: Int): DataFrame = {
    val user = col(userCol)
    val firstDay = events.groupBy(user)
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activeDays = events.select(user, to_date(col(tsCol)).as("day")).distinct()
    firstDay.join(activeDays, Seq(userCol))
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("offset"))
      .agg(countDistinct(user).as("n_users"))
  }
}
