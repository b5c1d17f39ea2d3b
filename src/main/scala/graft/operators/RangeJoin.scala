package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval × point range join (no equality key) — an operator whose
  * naive form is a broadcast-nested-loop/cartesian with a range filter:
  * every point tested against every interval, O(|I|·|P|) at 100 TB.
  *
  * Scale design — bucketize: pick a bucket width W on the join domain;
  * a point belongs to exactly ONE bucket (`floor(p/W)`), an interval
  * overlaps `floor(lo/W) .. floor(hi/W)` buckets (≈ len/W + 1). Explode
  * intervals to their buckets, equi-join on the bucket id (a plain
  * shuffled hash join Catalyst can plan, partition and AQE-balance),
  * then apply the exact range predicate. Each qualifying pair meets in
  * exactly one bucket — the point's — so no dedup pass is needed.
  *
  * Cost: |P| + |I|·(len/W + 1) shuffled rows instead of the |I|·|P|
  * product; W should be of the order of the typical interval length
  * (W ≫ len wastes bucket fan-in, W ≪ len explodes intervals).
  */
object RangeJoin {

  /** Join `intervals` [loCol, hiCol) — or [lo, hi] with
    * `hiInclusive = true` — against `points` on a LONG domain (callers
    * map timestamps via `unix_timestamp`-style epoch columns first).
    * Output: all interval columns + all point columns; names must not
    * collide (select/alias beforehand).
    */
  def intervalJoin(
      intervals: DataFrame, loCol: String, hiCol: String,
      points: DataFrame, ptCol: String,
      bucketWidth: Long, hiInclusive: Boolean = false): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = lit(bucketWidth)
    val iv = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    val pt = points.withColumn("__bkt",
      floor(col(ptCol) / b).cast("long"))
    val bound: Column =
      if (hiInclusive) pt(ptCol) <= iv(hiCol) else pt(ptCol) < iv(hiCol)
    iv.join(pt, iv("__bkt") === pt("__bkt") &&
        pt(ptCol) >= iv(loCol) && bound)
      .drop("__bkt")
  }
}
