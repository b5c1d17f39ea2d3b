package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lee–Seung NMF invariants the hash oracle can't express: entries stay
  * nonnegative through the multiplicative updates, the updates actually
  * REDUCE reconstruction error versus the seeded init (the Lee–Seung
  * monotonicity, modulo 6dp rounding), and the factorization separates
  * topics on a corpus with two disjoint term blocks.
  */
class NmfSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint topic blocks: docs 1-6 use fruit terms, 7-12 metal
  // terms, so a rank-2 factorization has an obvious parts-based answer
  private lazy val docs = Seq(
    (1L, "apple banana cherry apple"), (2L, "banana cherry plum"),
    (3L, "apple plum banana banana"), (4L, "cherry apple plum"),
    (5L, "plum banana apple"), (6L, "cherry cherry banana"),
    (7L, "iron copper zinc iron"), (8L, "copper zinc tin"),
    (9L, "iron tin copper copper"), (10L, "zinc iron tin"),
    (11L, "tin copper iron"), (12L, "zinc zinc copper"))
    .toDF("doc_id", "text")

  private def frob(v: DataFrame, w: DataFrame, h: DataFrame): Double = {
    val wh = w.join(h, "topic")
      .groupBy($"doc_id", $"term")
      .agg(sum($"w".cast("double") * $"h".cast("double")).as("r"))
    v.join(wh, Seq("doc_id", "term"), "outer")
      .select((coalesce($"v".cast("double"), lit(0.0)) -
        coalesce($"r", lit(0.0))).as("e"))
      .agg(sum($"e" * $"e")).head().getDouble(0)
  }

  test("entries stay nonnegative and reconstruction error decreases " +
    "from the seeded init") {
    val v = Nmf.tfidf(docs, maxDfFrac = 0.9)
    assert(v.count() > 0)
    val (w0, h0) = Nmf.factorize(v, k = 2, rounds = 0)
    val (w2, h2) = Nmf.factorize(v, k = 2, rounds = 2)
    Seq(w0 -> "w", w2 -> "w", h0 -> "h", h2 -> "h").foreach {
      case (m, c) =>
        assert(m.filter(col(c) < 0).count() === 0, s"negative $c entry")
    }
    val (e0, e2) = (frob(v, w0, h0), frob(v, w2, h2))
    assert(e2 < e0, s"error did not decrease: init $e0 -> round2 $e2")
  }

  test("disjoint term blocks land in different topics") {
    val v = Nmf.tfidf(docs, maxDfFrac = 0.9)
    // 2 rounds (the gate config) is still mid-separation on this seed;
    // by 8 the block structure must be fully recovered
    val (_, h) = Nmf.factorize(v, k = 2, rounds = 8)
    val top = Nmf.topTerms(h, 3).collect()
      .groupBy(_.getAs[Int]("topic"))
      .view.mapValues(_.map(_.getAs[String]("term")).toSet).toMap
    val fruit = Set("apple", "banana", "cherry", "plum")
    // each topic's top terms should be drawn from ONE block
    top.values.foreach { terms =>
      val inFruit = terms.count(fruit)
      assert(inFruit == 0 || inFruit == terms.size,
        s"mixed topic: $terms")
    }
    // and the two topics should not pick the same block
    val blocks = top.values.map(t => t.exists(fruit)).toSeq
    assert(blocks.distinct.size == 2, s"both topics chose one block: $top")
  }

  test("topicMixture assigns the two doc blocks to different dominant " +
    "topics with majority shares") {
    val v = Nmf.tfidf(docs, maxDfFrac = 0.9)
    val (w, _) = Nmf.factorize(v, k = 2, rounds = 8)
    val mix = Nmf.topicMixture(w).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("topic"),
        r.getAs[Double]("share"))).toSeq
    assert(mix.size == 12)
    mix.foreach { case (d, _, s) =>
      assert(s > 0.0 && s <= 1.0, s"doc $d share $s")
    }
    val fruitTopics = mix.filter(_._1 <= 6).map(_._2).toSet
    val metalTopics = mix.filter(_._1 > 6).map(_._2).toSet
    assert(fruitTopics.size == 1 && metalTopics.size == 1 &&
      fruitTopics != metalTopics, s"mixtures did not separate: $mix")
    // dominant topic really dominates on cleanly separated blocks
    assert(mix.forall(_._3 > 0.5), s"weak dominance: $mix")
  }
}
