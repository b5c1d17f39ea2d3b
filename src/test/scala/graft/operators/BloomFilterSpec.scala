package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomFilter: state shape, bitmap packing, and the membership
  * guarantees — no false negatives ever, false positives bounded and
  * eliminated by a verifying join.
  */
class BloomFilterSpec extends SparkSpec {

  private val M = 1 << 10
  private val K = 3

  private def keysDf(keys: Seq[String]) = {
    import spark.implicits._
    keys.toDF("key")
  }

  test("bitsTable sets at most k bits per key, all within range") {
    import spark.implicits._
    val bits = BloomFilter.bitsTable(keysDf(Seq("alpha")), $"key", K, M)
      .as[Int].collect().sorted
    assert(bits.nonEmpty && bits.length <= K)
    assert(bits.forall(b => b >= 0 && b < M))
  }

  test("no false negatives: every inserted key probes positive, with duplicates preserved") {
    import spark.implicits._
    val inserted = (0 until 200).map(i => s"key_$i")
    val bits = BloomFilter.bitsTable(keysDf(inserted), $"key", K, M)
    val words = BloomFilter.bitmap(bits, M)
    // probe with duplicates — multiplicity must survive the filter
    val probes = (inserted ++ inserted).toDF("key")
    val kept = BloomFilter.mightContain(words, probes, $"key", K, M)
      .as[String].collect()
    assert(kept.length == 2 * inserted.length)
    assert(kept.toSet == inserted.toSet)
  }

  test("false positives exist but are bounded at the design rate") {
    import spark.implicits._
    val inserted = (0 until 200).map(i => s"key_$i")
    val words = BloomFilter.bitmap(
      BloomFilter.bitsTable(keysDf(inserted), $"key", K, M), M)
    val outside = (0 until 2000).map(i => s"other_$i")
    val fp = BloomFilter.mightContain(words, outside.toDF("key"), $"key", K, M)
      .count()
    // n=200, m=1024, k=3 → theoretical fp ≈ (1-e^(-kn/m))^k ≈ 0.084;
    // allow generous slack — the property is "small", not an exact rate
    assert(fp.toDouble / outside.length < 0.25, s"fp rate ${fp.toDouble / outside.length}")
  }

  test("bitmap round-trips the bit rows exactly") {
    import spark.implicits._
    val bits = BloomFilter.bitsTable(keysDf((0 until 50).map(_.toString)), $"key", K, M)
    val fromRows = bits.as[Int].collect().toSet
    val words = BloomFilter.bitmap(bits, M)
    val fromWords = (0 until M).filter(b => (words(b >>> 6) & (1L << (b & 63))) != 0L).toSet
    assert(fromWords == fromRows)
  }

  test("broadcast-UDF path (large m) agrees with the literal path") {
    import spark.implicits._
    val bigM = 1 << 17 // 2048 words → takes the broadcast branch
    val inserted = (0 until 300).map(i => s"key_$i")
    val bits = BloomFilter.bitsTable(keysDf(inserted), $"key", K, bigM)
    val words = BloomFilter.bitmap(bits, bigM)
    assert(words.length > 1024)
    val probes = (inserted ++ (0 until 500).map(i => s"nope_$i")).toDF("key")
    val kept = BloomFilter.mightContain(words, probes, $"key", K, bigM)
      .as[String].collect().toSet
    assert(inserted.toSet.subsetOf(kept))
    // at m=131072, n=300, k=3 false positives are ~0 — everything kept
    // beyond the inserted set would be a collision triple
    assert((kept -- inserted.toSet).size < 5)
  }

  test("rejects non-power-of-two m") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      BloomFilter.bitsTable(keysDf(Seq("x")), $"key", K, 1000)
    }
  }
}
