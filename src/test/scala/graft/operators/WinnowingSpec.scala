package graft.operators

import graft.SparkSpec

/** Winnowing fingerprints — pins the Schleimer et al. guarantees the
  * operator exists for, against an independent local reimplementation:
  * (a) exact fingerprint sets match a plain-Scala winnow, (b) any
  * shared substring of length >= w+k-1 yields a shared fingerprint,
  * (c) selection density is ~2/(w+1) not 1, (d) position-shift
  * robustness (prefix insertion preserves shared fingerprints).
  */
class WinnowingSpec extends SparkSpec {

  private val K = 8
  private val W = 8

  private def fnv(s: String): Long = {
    var h = -3750763034362895579L // 14695981039346656037 as signed
    s.getBytes("UTF-8").foreach { b =>
      h = (h ^ (b & 0xffL)) * 1099511628211L
    }
    h
  }

  /** Independent local winnow: returns the (pos, h) fingerprint set. */
  private def localWinnow(text: String): Set[(Int, Long)] = {
    val nrm = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (nrm.length < K + W - 1) return Set.empty
    val hs = (0 to nrm.length - K).map(i => fnv(nrm.substring(i, i + K)))
    (0 to hs.length - W).map { j =>
      // rightmost minimum in hs[j .. j+W-1]
      val window = (j until j + W)
      val m = window.minBy(i => (hs(i), -i))
      (m, hs(m))
    }.toSet
  }

  private def sparkWinnow(docs: Seq[(Long, String)]): Map[Long, Set[(Int, Long)]] = {
    import spark.implicits._
    val fp = Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
    fp.collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("pos"), r.getAs[Long]("h")))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(r => (r._2, r._3)).toSet }
  }

  private val lorem = "The quick brown fox jumps over the lazy dog while " +
    "seventeen zebras quietly graze beside a winding river in autumn"
  private val other = "Completely unrelated content about distributed " +
    "query engines and columnar storage formats for analytical work"

  test("fingerprints match the independent local winnow exactly") {
    val docs = Seq(1L -> lorem, 2L -> other, 3L -> (lorem + " " + other))
    val got = sparkWinnow(docs)
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == localWinnow(t), s"doc $id")
    }
  }

  test("shared substring of length >= w+k-1 guarantees a shared fingerprint") {
    val shared = "thisexactsharedrunoftext" // 24 >= 15 normalized chars
    val a = "prefix one " + shared + " suffix alpha"
    val b = "totally different beginning " + shared + " and another ending"
    val got = sparkWinnow(Seq(1L -> a, 2L -> b))
    val ha = got(1L).map(_._2)
    val hb = got(2L).map(_._2)
    assert((ha & hb).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("selection keeps a sparse subset and survives prefix insertion") {
    val got = sparkWinnow(Seq(1L -> lorem, 2L -> ("zzz " + lorem)))
    val nGrams = lorem.toLowerCase.replaceAll("[^a-z0-9]", "").length - K + 1
    assert(got(1L).size < nGrams / 2, s"${got(1L).size} of $nGrams selected")
    // prefix shifts every position; hash VALUES of the shared tail remain
    val shared = got(1L).map(_._2) & got(2L).map(_._2)
    assert(shared.size >= (got(1L).size * 3) / 4,
      s"only ${shared.size}/${got(1L).size} fingerprints survive a prefix shift")
  }

  test("short documents yield no fingerprints") {
    val got = sparkWinnow(Seq(1L -> "tiny text", 2L -> lorem))
    assert(!got.contains(1L) && got.contains(2L))
  }
}
