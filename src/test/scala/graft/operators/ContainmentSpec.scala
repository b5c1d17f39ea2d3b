package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containment pairs: the prefix-filtered inverted-index candidate
  * path must be LOSSLESS vs all-pairs truth at the threshold (the d13
  * gate proves it on the corpus slice; this proves it on adversarial
  * random data), and asymmetry must hold: a small doc inside a big one
  * scores 1.0 in one direction only.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def bruteContainment(
      toks: Seq[(Long, Seq[String])], n: Int, tau: Double): Set[(Long, Long)] = {
    def sh(ts: Seq[String]): Set[String] =
      if (ts.length < n) Set.empty
      else ts.sliding(n).map(_.mkString(" ")).toSet
    val sets = toks.map { case (id, ts) => id -> sh(ts) }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      if sa.intersect(sb).size.toDouble / sa.size >= tau
    } yield (a, b)).toSet
  }

  test("small doc contained in big doc: containment 1.0 one way only") {
    val small = "alpha beta gamma delta epsilon zeta".split(" ").toSeq
    val big = ("intro words first " + small.mkString(" ") + " trailing content here after").split(" ").toSeq
    val df = Seq((0L, small), (1L, big)).toDF("id", "tokens")
    val got = Dedup.containmentPairs(df, 3, 0.9)
      .select($"a", $"b", $"containment").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("prefix filter is lossless vs brute force on random corpora") {
    val rnd = new Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 40L).map { i =>
      val len = 3 + rnd.nextInt(15)
      i -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
    }
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val expected = bruteContainment(docs, 3, tau)
      val got = Dedup.containmentPairs(docs.toDF("id", "tokens"), 3, tau)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"tau=$tau diff=${got.diff(expected)} / ${expected.diff(got)}")
    }
  }

  test("maxDf caps index fan-out, trading recall only") {
    val shared = "one two three four five six seven".split(" ").toSeq
    // every doc shares the same shingles -> every hash has df = 10
    val docs = (0L until 10L).map(i => i -> shared).toDF("id", "tokens")
    val uncapped = Dedup.containmentPairs(docs, 3, 0.9)
    assert(uncapped.count() == 90) // all ordered pairs
    val capped = Dedup.containmentPairs(docs, 3, 0.9, maxDf = 5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    // capped results must be a subset (no false positives introduced)
    assert(capped.isEmpty)
  }
}
