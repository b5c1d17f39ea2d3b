package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV ("theta") sketch: the k minimum FNV hash values of a set, plus
  * closed-form SET-OPERATION estimators (Beyer et al. 2007 "On synopses
  * for distinct-value estimation under multiset operations"; the theta
  * union/intersection rules popularized by the DataSketches library).
  *
  * Where sk09's HyperLogLog intersection goes through inclusion-
  * exclusion (error grows with the union), the theta estimator reads
  * the intersection DIRECTLY from the retained sample below the union's
  * threshold θ — each surviving hash stands for 1/θ_norm distinct
  * values. The sketch is mergeable (bottom-k of a union = bottom-k of
  * the per-shard bottom-k's), so at 100 TB every shard contributes an
  * O(k) summary through map-side partial top-k (Spark rewrites the
  * rank-≤-k window into WindowGroupLimit) and only O(k · shards) rows
  * ever reach a single place.
  *
  * Hashes are kept UNSIGNED as DECIMAL(20,0) — exact integers, so the
  * ordering and θ selection are bit-reproducible in DuckDB's HUGEINT —
  * and leave exact space only in the final estimate division.
  */
object ThetaSketch {

  private val Two64 = BigDecimal(2).pow(64)

  /** FNV-1a of a string column, RE-FOLDED through the byte-wise perm
    * hash, as an exact UNSIGNED decimal. The second fold matters: raw
    * FNV-1a of short similar strings is far from uniform near 0 (the
    * spec measured a 3× distinct-count bias on "item-N" keys), and KMV
    * reads its estimate exactly from the small-value tail; one more
    * pass over the 8 hash bytes restores avalanche (est within ~4% on
    * the same keys). Both folds replay in the oracle's HUGEINT SQL
    * (FnvSql.ofString + FnvSql.perm).
    */
  def unsignedHash(c: Column): Column = {
    val h = graft.functions.Fnv.fnv1a_perm(
      lit(0), graft.functions.Fnv.fnv1a64(c))
    (h.cast("decimal(20,0)") +
      when(h < 0, lit(Two64.bigDecimal)).otherwise(lit(BigDecimal(0).bigDecimal)))
      .cast("decimal(20,0)")
  }

  /** Per-group k smallest hash values of (grp, hu) rows (hu distinct
    * within grp). The rank-≤-k filter compiles to WindowGroupLimit:
    * each map task forwards at most k rows per group.
    */
  def bottomK(hashes: DataFrame, grpCol: String, k: Int): DataFrame =
    hashes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(grpCol)).orderBy(col("hu"))))
      .filter(col("rn") <= k)
      .drop("rn")

  /** (k-1)/θ_norm estimate of a sketch's distinct count, given θ as an
    * exact unsigned decimal. Double math is spelled in one fixed op
    * order (2^64 is a power of two, so the literal is exact in both
    * engines).
    */
  def estimate(theta: Column, k: Int): Column =
    round(lit(k - 1) * (lit(18446744073709551616.0) /
      theta.cast("double")), 3)

  /** Per-retained-hash weight under threshold θ: each hash below θ
    * stands for 1/θ_norm = 2^64/θ distinct values.
    */
  def weightUnder(theta: Column, nBelow: Column): Column =
    round(nBelow.cast("double") * (lit(18446744073709551616.0) /
      theta.cast("double")), 3)
}
