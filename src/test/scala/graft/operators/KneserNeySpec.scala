package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** a36_kneser_ney — interpolated KN bigram LM beside the add-1 baseline.
  * Ground truth is an INDEPENDENT plain-Scala reimplementation (maps +
  * doubles in the query's exact op order), run over synthetic corpora
  * written as documents.parquet: (a) a normal mixed corpus, (b) the
  * degenerate no-singleton corpus that must take the D=0.5 fallback.
  * Also pins that KN actually changes the ranking vs add-1 on real data
  * (the reason the query exists).
  */
class KneserNeySpec extends SparkSpec {

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Local KN+add-1 per-doc surprisals, mirroring a36's op order. */
  private def localModel(docs: Seq[(Long, String)])
      : Map[Long, (Long, Double, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-zA-Z]+".r.findAllIn(t.toLowerCase).toVector
    }
    val uni = toks.flatMap(_._2).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val vocab = uni.size.toLong
    val bigrams = toks.collect { case (id, t) if t.size >= 2 =>
      id -> t.sliding(2).map(p => (p(0), p(1))).toVector
    }
    val bic = bigrams.flatMap(_._2).groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val n1 = bic.values.count(_ == 1L).toLong
    val n2 = bic.values.count(_ == 2L).toLong
    val tt = bic.size.toLong
    val d = if (n1 + 2 * n2 == 0) 0.5 else round6(n1 / (n1 + 2.0 * n2))
    val fan = bic.keys.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
    val cont = bic.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    bigrams.map { case (id, bs) =>
      val micro = bs.map { case (w1, w2) =>
        val c1 = uni(w1).toDouble
        val p = math.max(bic((w1, w2)) - d, 0.0) / c1 +
          (d * fan(w1) / c1) * (cont(w2).toDouble / tt)
        math.round(round6(-math.log10(p)) * 1e6)
      }.sum
      val micro1 = bs.map { case (w1, w2) =>
        val c1 = uni(w1).toDouble
        math.round(round6(-math.log10((bic((w1, w2)) + 1.0) / (c1 + vocab))) * 1e6)
      }.sum
      val n = bs.size.toLong
      id -> (n, ((2 * micro + n) / (2 * n)) / 1e6,
        ((2 * micro1 + n) / (2 * n)) / 1e6)
    }.toMap
  }

  private def runQuery(docs: Seq[(Long, String)]): Map[Long, (Long, Option[Double], Option[Double])] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("kn_docs").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("a36_kneser_ney")(spark, dir).collect().map { r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_bigrams"),
        Option(r.getAs[java.lang.Double]("kn_surprisal")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("addone_surprisal")).map(_.doubleValue))
    }.toMap
  }

  test("matches the independent local model on a mixed corpus") {
    val docs = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat ran to the dog",
      3L -> "a dog sat on a log",
      4L -> "cats and dogs ran",
      5L -> "x")
    val exp = localModel(docs)
    val got = runQuery(docs)
    assert(got.keySet == docs.map(_._1).toSet)
    // doc 5 has one token: no bigrams, null surprisals
    assert(got(5L) == ((0L, None, None)))
    exp.foreach { case (id, (n, kn, a1)) =>
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(got(id)._2.contains(kn), s"doc $id kn ${got(id)._2} vs $kn")
      assert(got(id)._3.contains(a1), s"doc $id addone ${got(id)._3} vs $a1")
    }
  }

  test("degenerate corpus with no singleton/doubleton bigrams uses D=0.5") {
    // every bigram type occurs >= 3 times -> n1 = n2 = 0
    val docs = Seq(
      1L -> "x y x y x y x y",
      2L -> "x y x y x y x y")
    val exp = localModel(docs)
    val got = runQuery(docs)
    exp.foreach { case (id, (n, kn, a1)) =>
      assert(got(id) == ((n, Some(kn), Some(a1))))
    }
  }

  test("KN reorders documents relative to add-1 on the sf0.001 corpus") {
    val rows = graft.SparkEntry.queries("a36_kneser_ney")(spark, sf("sf0.001"))
      .collect()
      .flatMap { r =>
        for {
          kn <- Option(r.getAs[java.lang.Double]("kn_surprisal"))
          a1 <- Option(r.getAs[java.lang.Double]("addone_surprisal"))
        } yield (r.getAs[Long]("doc_id"), kn.doubleValue, a1.doubleValue)
      }
    assert(rows.length > 400)
    // KN discounts seen mass less aggressively than add-1 on a closed
    // vocabulary, but the RANKINGS must genuinely differ somewhere —
    // count discordant pairs on the two orderings via rank vectors
    val byKn = rows.sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex.toMap
    val byA1 = rows.sortBy(r => (r._3, r._1)).map(_._1).zipWithIndex.toMap
    val moved = rows.count(r => byKn(r._1) != byA1(r._1))
    assert(moved > rows.length / 10,
      s"only $moved/${rows.length} docs changed rank - models look identical")
  }
}
