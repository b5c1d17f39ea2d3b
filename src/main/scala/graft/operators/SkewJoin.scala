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
  *    over ALL of its columns — deterministic, no rand(), replayable;
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
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(nSalts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall,
      saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
