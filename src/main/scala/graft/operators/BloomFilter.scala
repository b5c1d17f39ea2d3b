package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** Deterministic FNV-based Bloom filter (Bloom 1970) — the constant-size
  * membership sketch that replaces "broadcast the whole key set" in
  * decontamination and join pre-filtering at 100 TB.
  *
  * Same design rationale as [[HllSketch]]/[[CmsSketch]]: Spark's own
  * `bloom_filter_agg` / `might_contain` pair (and the runtime row-group
  * filters AQE injects) are the production tools, but their xxhash64
  * state cannot be replayed by an engine-independent SQL oracle. This
  * filter keeps the identical distributed shape — build is one
  * explode + distinct producing at most `mBits` set-bit rows, probe is a
  * broadcast join against that bit set — while every bit is
  * bit-reproducible in DuckDB (FNV-1a in HUGEINT space, power-of-two
  * modulus so the signed `& (m-1)` and unsigned `% m` agree).
  *
  * Guarantee structure: no false negatives (every inserted key probes
  * positive), tunable false positives (`k ln 2 ≈ m/n` optimal). The
  * decontamination gate (d11) verifies exactly that: the bloom-flagged
  * set is a superset of the exact shared-shingle set, cell-for-cell.
  *
  * 100 TB shape: the bit set is at most `mBits` rows (one long each —
  * e.g. 2^27 bits ≈ 16 MB as a bitmap, a broadcast regardless of how
  * many billions of keys built it), the build is linear with map-side
  * combine (distinct), and the probe side never shuffles — a broadcast
  * hash semi-join per partition.
  */
object BloomFilter {

  private def requirePow2(mBits: Int): Unit =
    require(mBits >= 2 && (mBits & (mBits - 1)) == 0,
      s"mBits $mBits must be a power of two")

  /** The k bit positions of a key (deduplicated — two hash functions may
    * collide on one position; membership needs each DISTINCT position).
    */
  def positions(key: Column, k: Int, mBits: Int): Column = {
    requirePow2(mBits)
    require(k >= 1 && k <= 16, s"k $k out of range")
    val h = Fnv.fnv1a64(key.cast("string"))
    array_distinct(array((0 until k).map(d =>
      Fnv.fnv1a_perm(lit(d), h).bitwiseAND(lit((mBits - 1).toLong)).cast("int")): _*))
  }

  /** The filter state: one row per SET bit position, sorted ascending.
    * (A bitmap packs these `mBits / 64` longs for shipping; the row form
    * is the oracle-checkable state table, same philosophy as sk01/sk04.)
    */
  def bitsTable(df: DataFrame, key: Column, k: Int, mBits: Int): DataFrame =
    df.select(explode(positions(key, k, mBits)).as("bit")).distinct()

  /** Pack the set-bit rows into a `mBits / 64` long bitmap — the form
    * the filter actually ships in. The collect is bounded by `mBits`
    * (the sketch size), NOT by the input cardinality: a 2^27-bit filter
    * is 2 M longs = 16 MB however many billions of keys built it. This
    * is the one place a driver action is correct — it is exactly what
    * `bloom_filter_agg` does to produce its literal.
    */
  def bitmap(bits: DataFrame, mBits: Int): Array[Long] = {
    requirePow2(mBits)
    val words = new Array[Long](mBits / 64)
    // collect-bound: sketch: mBits set-bit rows -> mBits/64 longs (16 MB at 2M bits) at any corpus size
    bits.select(col("bit").cast("int")).collect().foreach { r =>
      val b = r.getInt(0)
      require(b >= 0 && b < mBits, s"bit $b out of range for mBits $mBits")
      words(b >>> 6) |= (1L << (b & 63))
    }
    words
  }

  /** Membership probe: keep `probes` rows whose `key` has ALL its bit
    * positions set (possible member — no false negatives, row
    * multiplicity preserved). Row-local expression against the bitmap
    * literal: the probe side is a narrow filtered scan, no shuffle, no
    * join — the shape of a runtime row-filter.
    */
  def mightContain(words: Array[Long], probes: DataFrame, key: Column,
      k: Int, mBits: Int): DataFrame =
    if (words.length <= 1024) {
      // ≤ 64 Kbit: embed the bitmap as plan literals — fully
      // codegen'd, no closure, the runtime-row-filter shape
      val wordsLit = array(words.map(lit): _*)
      // single-bit masks as a literal lookup (shiftleft's Scala wrapper
      // only takes a constant shift; an indexed mask is codegen-friendly)
      val masksLit = array((0 until 64).map(i => lit(1L << i)): _*)
      val hit = forall(positions(key, k, mBits), p =>
        element_at(wordsLit, (p / 64).cast("int") + 1)
          .bitwiseAND(element_at(masksLit, pmod(p, lit(64)) + 1)) =!= 0L)
      probes.filter(hit)
    } else {
      // big filter (a 2^27-bit bitmap is 2M longs — as a plan literal
      // it would blow past Janino's method limits and re-serialize per
      // task binding): ship ONCE per executor as a broadcast, probe
      // through a closure. Bit-identical semantics to the literal path.
      val sc = probes.sparkSession.sparkContext
      val bc = sc.broadcast(words)
      val probe = udf { (pos: Seq[Int]) =>
        val w = bc.value
        pos.forall(p => (w(p >>> 6) & (1L << (p & 63))) != 0L)
      }
      probes.filter(probe(positions(key, k, mBits)))
    }
}
