package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single right row
  * with the greatest right-time ≤ the left row's time among rows sharing
  * the join key (the kdb/Pandas `merge_asof` / SQL `ASOF JOIN`
  * semantics) — an operator Spark has no built-in for.
  *
  * Scale design — NOT the naive `l JOIN r ON key AND r.t <= l.t` +
  * per-left-row top-1, which materializes every (left, earlier-right)
  * pair (quadratic per key, unbounded at 100 TB). Instead the classic
  * union-window formulation:
  *
  *   1. tag both sides and union them — right rows carry their payload
  *      struct, left rows a null;
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, tag, tie) with right rows (tag 0) sorting before left
  *      rows (tag 1) at equal times — "at or before" inclusive;
  *   3. `last(payload, ignoreNulls)` over rows unbounded-preceding →
  *      current row carries the latest earlier right payload forward;
  *   4. keep the left rows.
  *
  * Cost: one shuffle + one sort over |L| + |R| rows, zero pair
  * explosion — the same shape a sort-merge join would take, with the
  * "latest earlier" semantics fused into the sort. Ties between right
  * rows at the same timestamp resolve to the greatest `rightTie` value
  * (deterministic).
  */
object AsofJoin {

  /** @param payload right columns to attach (emitted as `asof_<name>`)
    * @param rightTie right column breaking equal-time ties (max wins)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTie: String): DataFrame = {
    val payloadStruct = struct((payload :+ rightTie).distinct.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    // SQL join semantics: a NULL key or NULL time never matches, so
    // such right rows must not enter the window (they would otherwise
    // sort into the null-key partition / nulls-first position and be
    // carried onto left rows there). Left rows with nulls pass through
    // and simply find no earlier payload.
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).cast("long").as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__tag"),
        col(rightTie).cast("long").as("__tie"),
        payloadStruct.as("__p"),
        lit(null).cast(leftType).as("__l"))
    val lSide = left.select(
      col(leftKey).cast("long").as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__tag"),
      lit(Long.MaxValue).as("__tie"),
      lit(null).cast(payloadType).as("__p"),
      leftStruct.as("__l"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val asofCols = payload.map(c => col(s"__m.$c").as(s"asof_$c"))
    rSide.unionByName(lSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols ++ asofCols: _*)
  }
}
