package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (100 TB design tool, SURVEY §7.5).
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, but a
  * single pathological key (one customer with 10⁹ rows) still lands every
  * row on one reducer when the plan is a shuffled hash/sort-merge join.
  * Salting breaks such keys apart deterministically:
  *
  *  - the skewed (big) side gets a salt in [0, n) derived from xxhash64
  *    over the join key plus a stable per-row discriminator
  *    (partition id + row offset) — deterministic, no rand(), replayable,
  *    and independent of the other columns' types (a MapType payload
  *    column would break a whole-row hash);
  *  - the small side is replicated n× (one row per salt value);
  *  - the join key becomes (key, salt), spreading each hot key over n
  *    reducers. Result set is identical to the plain join.
  *
  * Use when a dimension is too big to broadcast AND the fact side's key
  * histogram is heavy-tailed. n=16-64 covers most skew; the cost is
  * n× replication of the small side (still far below broadcast when the
  * small side is mid-sized).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, nSalts: Int = 16): DataFrame = {
    // Collision-proof salt column name (caller tables may already have
    // a __salt column of their own).
    val taken = (big.columns ++ small.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"__graft_salt_$i")
      .dropWhile(taken.contains).next()
    // Hash only the join key plus a stable row discriminator — never the
    // whole row (unhashable types, e.g. MapType payloads, would throw).
    val saltedBig = big.withColumn(saltCol,
      pmod(xxhash64(col(bigKey), spark_partition_id(), monotonically_increasing_id()),
        lit(nSalts)).cast("int"))
    val saltedSmall = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall,
      saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig(saltCol) === saltedSmall(saltCol))
      .drop(saltCol)
  }
}
