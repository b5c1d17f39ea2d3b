package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the single right row closest
  * in time among rows sharing the join key — backward (greatest right
  * time ≤ left time; the kdb/Pandas `merge_asof` / SQL `ASOF JOIN`
  * default) or forward (smallest right time ≥ left time). An operator
  * Spark has no built-in for.
  *
  * Scale design — NOT the naive `l JOIN r ON key AND r.t <= l.t` +
  * per-left-row top-1, which materializes every (left, earlier-right)
  * pair (quadratic per key, unbounded at 100 TB). Instead the classic
  * union-window formulation:
  *
  *   1. tag both sides and union them — right rows carry their payload
  *      struct, left rows a null;
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, tag, tie) with the match-eligible side sorting toward
  *      the left row at equal times (inclusive "at or before/after");
  *   3. backward: `last(payload, ignoreNulls)` over unbounded-preceding
  *      carries the latest earlier right payload forward; forward:
  *      `first(payload, ignoreNulls)` over unbounded-following pulls
  *      the earliest later right payload back;
  *   4. keep the left rows.
  *
  * Cost: one shuffle + one sort over |L| + |R| rows, zero pair
  * explosion — the same shape a sort-merge join would take, with the
  * nearest-in-time semantics fused into the sort. Equal-time ties
  * between right rows resolve deterministically: greatest `rightTie`
  * for backward, smallest for forward.
  */
object AsofJoin {

  /** @param payload right columns to attach (emitted as `asof_<name>`)
    * @param rightTie right column breaking equal-time ties (max wins
    *                 backward, min wins forward)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTie: String): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, rightTie, backward = true)

  /** Forward as-of: earliest right row at or after the left row's time. */
  def asofForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTie: String): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      payload, rightTie, backward = false)

  private def asofImpl(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], rightTie: String,
      backward: Boolean): DataFrame = {
    // The key only feeds the window's partitionBy, so ANY type works —
    // but the two sides union into one column, so their types must
    // agree; a silent cast would turn e.g. string keys into NULLs and
    // "no match" instead of an error. The tie becomes a long so the
    // left side can carry a ±∞ sentinel — integral only, checked.
    val lkType = left.schema(leftKey).dataType
    val rkType = right.schema(rightKey).dataType
    require(lkType == rkType,
      s"asof join key types must match: left $leftKey is ${lkType.catalogString}, " +
        s"right $rightKey is ${rkType.catalogString}")
    val tieType = right.schema(rightTie).dataType
    val tieIsIntegral = tieType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(tieIsIntegral,
      s"asof rightTie must be an integral column, got ${tieType.catalogString}")
    val payloadStruct = struct((payload :+ rightTie).distinct.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    // SQL join semantics: a NULL key or NULL time never matches, so
    // such right rows must not enter the window (they would otherwise
    // sort into the null-key partition / nulls-first position and be
    // carried onto left rows there). Left rows with nulls pass through
    // and simply find no matching payload.
    //
    // Tag ordering puts right rows on the match-eligible side of the
    // left row at equal times: backward scans preceding rows, so right
    // (tag 0) sorts BEFORE left (tag 1); forward scans following rows,
    // so left (tag 0) sorts before right (tag 1). The left sentinel tie
    // keeps left rows outside the right-tie ordering.
    val (rTag, lTag, lTieSentinel) =
      if (backward) (0, 1, Long.MaxValue) else (1, 0, Long.MinValue)
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(rTag).as("__tag"),
        col(rightTie).cast("long").as("__tie"),
        payloadStruct.as("__p"),
        lit(null).cast(leftType).as("__l"))
    val lSide = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(lTag).as("__tag"),
      lit(lTieSentinel).as("__tie"),
      lit(null).cast(payloadType).as("__p"),
      leftStruct.as("__l"))

    val ordered = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__tie"))
    val (w, pick) =
      if (backward)
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__p"), ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__p"), ignoreNulls = true))

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val asofCols = payload.map(c => col(s"__m.$c").as(s"asof_$c"))
    rSide.unionByName(lSide)
      .withColumn("__m", pick.over(w))
      .filter(col("__tag") === lTag)
      .select(leftCols ++ asofCols: _*)
  }
}
