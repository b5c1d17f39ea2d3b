package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BitExprs, Fnv}

/** Deterministic HyperLogLog distinct-count sketch (Flajolet, Fusy,
  * Gandouet, Meunier 2007) over the FNV-1a hash family.
  *
  * Why not `approx_count_distinct`: Spark's built-in HLL++ is exactly
  * the right tool in production, but its xxhash64-based registers cannot
  * be replayed by an engine-independent SQL oracle, so it would be
  * un-gateable here. This sketch keeps the identical distributed shape —
  * one hash-aggregate producing m registers per group, constant state
  * per group regardless of input size, mergeable across partitions
  * (max is associative/commutative) — while every register value and
  * the final estimate are bit-reproducible in DuckDB (FNV fold in
  * HUGEINT space + exact power-of-two comparisons for ρ).
  *
  * 100 TB shape: the input never leaves its partitions — the groupBy
  * ships only (group, register, max ρ) partial states, m ≤ 2^p rows per
  * group per partition. That IS the HLL merge. The register table is
  * tiny (m per group) and the estimate a per-group fold over it.
  */
object HllSketch {

  /** Per-group register table: (grp, reg ∈ [0, 2^p), maxrho), one row
    * per register with unobserved registers at 0.
    */
  def registerTable(df: DataFrame, grpCol: String, value: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"precision $p out of range")
    val m = 1 << p
    // Hash the canonical string form (cross-engine reproducible; a
    // long-typed fast path would hash raw bytes instead).
    val h = Fnv.fnv1a64(value.cast("string"))
    // LSB-side split: register = LOW p bits, ρ = trailing-zero count of
    // the remaining bits + 1 (65-p when they are all zero). The paper's
    // MSB-side convention assumes a hash with uniform high bits; FNV-1a
    // has excellent LOW-bit dispersion but nearly constant high bits on
    // short inputs (measured: 200 short keys hit only 4 of 64 top-6-bit
    // patterns but 60+ of 64 low-6-bit ones), so the MSB form would
    // collapse the register index AND the ρ geometry.
    val reg = h.bitwiseAND(lit((1L << p) - 1)).cast("int")
    val rho = least(BitExprs.ntz_plus1(shiftrightunsigned(h, p)), lit(65 - p))
    val observed = df
      .select(col(grpCol).as("grp"), reg.as("reg"), rho.as("rho"))
      .groupBy(col("grp"), col("reg")).agg(max(col("rho")).as("maxrho"))
    val grid = df.select(col(grpCol).as("grp")).distinct()
      .select(col("grp"), explode(sequence(lit(0), lit(m - 1))).as("reg"))
    grid.join(observed, Seq("grp", "reg"), "left")
      .select(col("grp"), col("reg"),
        coalesce(col("maxrho"), lit(0)).cast("int").as("maxrho"))
  }

  /** α_m · m² for the standard published constants. */
  def alphaM2(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m
  }

  /** Per-group estimate from a [[registerTable]]: raw HLL harmonic-mean
    * estimate with the small-range linear-counting correction.
    *
    * Cross-engine determinism: the harmonic sum Σ 2^-ρ is computed as an
    * EXACT integer (terms scaled by 2^(64-p+1), the max ρ, summed as
    * DECIMAL — no float-order dependence), and the single double
    * division happens once against a precomputed numerator literal.
    */
  def estimates(registers: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val scale = 64 - p + 1 // max ρ, so every term 2^(scale-ρ) is a long
    val numer = alphaM2(p) * math.pow(2.0, scale) // exact: 2^scale < 2^62
    val agg = registers.groupBy(col("grp")).agg(
      sum(when(col("maxrho") === 0, 1).otherwise(0)).cast("int").as("zeros"),
      sum(expr(s"cast(shiftleft(1L, $scale - maxrho) as decimal(38,0))"))
        .as("sscaled"))
    val raw = lit(numer) / col("sscaled").cast("double")
    agg.select(col("grp"), col("zeros"),
      round(when(raw <= lit(2.5 * m) && col("zeros") > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
        .otherwise(raw), 3).as("est"))
  }
}
