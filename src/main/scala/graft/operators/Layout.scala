package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for multi-dimensional clustering (SURVEY §7.5).
  *
  * A table can only be SORTED by one column, so min/max file statistics
  * prune scans on that column alone. Interleaving the bits of two
  * columns into one Morton (z-order) key and sorting by IT keeps rows
  * close in BOTH dimensions inside each file — per-file min/max ranges
  * stay narrow on either column, and a predicate on either dimension
  * skips most files (the idea behind Delta/Iceberg `OPTIMIZE ZORDER`).
  *
  * The index is pure codegen'd integer arithmetic (shift/mask/add terms
  * folded by Catalyst — a narrow map, no UDF, no shuffle): computing it
  * costs nothing at 100 TB; the payoff is at read time, where clustered
  * writes turn full scans into file-skipping range scans.
  */
object Layout {

  /** 32-bit Morton key from the low 16 bits of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    */
  def zorder16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
}
