package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** Deterministic count-min sketch (Cormode & Muthukrishnan 2005) over
  * the FNV-1a hash family: a depth × width grid of counters where each
  * input increments one bucket per row (depth independent hash
  * functions), and a point frequency estimate is the MIN over the
  * depth counters for the key — an upper bound on the true count that
  * is tight when collisions are rare.
  *
  * Same design rationale as [[HllSketch]]: Spark's own
  * `count_min_sketch` aggregate is the production tool, but its
  * xxhash64-based state cannot be replayed by a DuckDB oracle. This
  * sketch keeps the identical distributed shape — one hash-aggregate
  * producing at most depth × width counters, constant state regardless
  * of input size, mergeable across partitions (sum is associative) —
  * while every counter is bit-reproducible in SQL.
  *
  * 100 TB shape: rows never leave their partitions; the groupBy ships
  * only (d, bucket, partial count) — at most depth × width rows per
  * partition (the map-side combine IS the sketch merge). The state is
  * O(depth × width) independent of input cardinality; estimates are a
  * broadcast-sized join against it.
  *
  * Width must be a power of two: bucket = low log2(width) bits of the
  * per-depth permuted hash, which agree between Spark's signed-long
  * `& (width-1)` and the oracle's unsigned-HUGEINT `% width` (the same
  * LSB-side parity trick as HllSketch — FNV's low bits are the
  * well-dispersed ones).
  */
object CmsSketch {

  private def requirePow2(width: Int): Unit =
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width $width must be a power of two")

  /** Per-depth bucket of an FNV-1a hash column. */
  private def bucket(d: Int, h: Column, width: Int): Column =
    Fnv.fnv1a_perm(lit(d), h).bitwiseAND(lit((width - 1).toLong)).cast("int")

  /** The sketch state: (d ∈ [0, depth), bucket ∈ [0, width), cnt), one
    * row per cell with unobserved cells at 0.
    */
  def sketchTable(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    requirePow2(width)
    require(depth >= 1 && depth <= 16, s"depth $depth out of range")
    val s = df.sparkSession
    val h = Fnv.fnv1a64(key.cast("string"))
    val cells = df.select(h.as("h"))
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d, col("h"), width).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val grid = s.range(depth).select(col("id").cast("int").as("d"))
      .crossJoin(s.range(width).select(col("id").cast("int").as("bucket")))
    grid.join(cells, Seq("d", "bucket"), "left")
      .select(col("d"), col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Point estimates for `keys` (a DataFrame whose `keyCol` is cast to
    * the same canonical string form the sketch hashed): min over the
    * depth counters. The sketch side is depth × width rows — broadcast.
    */
  def estimates(sketch: DataFrame, keys: DataFrame, keyCol: Column,
      depth: Int, width: Int): DataFrame = {
    requirePow2(width)
    val h = Fnv.fnv1a64(keyCol.cast("string"))
    val probes = keys.select(keyCol.as("key"), h.as("h"))
      .select(col("key"), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d, col("h"), width).as("bucket"))): _*)).as("c"))
      .select(col("key"), col("c.d").as("d"), col("c.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(col("key")).agg(min(col("cnt")).as("est"))
  }
}
