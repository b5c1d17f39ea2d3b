package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round's retrieval/curation additions: boilerplate scrub, BM25,
  * Hamming ANN over sign-binarized vectors, sorted-neighborhood
  * dedup, and Matryoshka truncation — hand-computed fixtures.
  */
class RetrievalOpsSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("Boilerplate.segments chunks the token stream in order, short tail kept") {
    import spark.implicits._
    val segs = docsDf(1L -> "a b c d e")
      .select(Boilerplate.segments($"text", 2).as("s"))
      .as[Seq[String]].head()
    assert(segs == Seq("a b", "c d", "e"))
  }

  test("Boilerplate.scrub drops corpus-frequent segments and reassembles the rest") {
    import spark.implicits._
    // "x y" appears in all 3 docs (>= 2), the rest are unique.
    val docs = docsDf(
      1L -> "x y a b",
      2L -> "x y c d",
      3L -> "x y e f")
    val out = Boilerplate.scrub(docs, "doc_id", "text", segN = 2, minDocs = 2L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_kept", $"n_dropped", $"scrubbed_hash")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
    // surviving text is exactly the non-boilerplate segment
    val md5ab = java.security.MessageDigest.getInstance("MD5")
      .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head._4 == md5ab)
  }

  test("Boilerplate.scrub hashes the empty string when everything is boilerplate") {
    import spark.implicits._
    val docs = docsDf(1L -> "x y", 2L -> "x y")
    val out = Boilerplate.scrub(docs, "doc_id", "text", 2, 2L)
      .select($"n_kept", $"scrubbed_hash").as[(Long, String)].collect()
    val md5empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert(out.forall(r => r._1 == 0L && r._2 == md5empty))
  }

  test("Bm25.score matches a hand-computed score and only returns matching docs") {
    import spark.implicits._
    val docs = docsDf(
      1L -> "spark spark fast",
      2L -> "slow table scan",
      3L -> "spark join")
    val out = Bm25.score(docs, "doc_id", split($"text", " "),
      Seq("spark"), k1 = 1.2, b = 0.75)
      .orderBy($"doc_id")
      .select($"doc_id", $"score").as[(Long, Double)].collect()
    // N=3, sum_dl=8, avgdl=8/3; term df=2, idf=ln((3-2+0.5)/(2+0.5)+1)
    val avgdl = 8.0 / 3
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def bm(tf: Long, dl: Long) =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq == Seq(1L, 3L)) // doc 2 has no query term
    assert(math.abs(out(0)._2 - bm(2, 3)) < 1e-9)
    assert(math.abs(out(1)._2 - bm(1, 2)) < 1e-9)
  }

  test("Bm25 ranks higher-tf docs above longer docs with equal tf") {
    import spark.implicits._
    val docs = docsDf(
      1L -> "spark a b c d e f g h i j k",
      2L -> "spark a b")
    val out = Bm25.score(docs, "doc_id", split($"text", " "), Seq("spark"))
      .orderBy(desc("score")).select($"doc_id").as[Long].collect()
    assert(out.toSeq == Seq(2L, 1L)) // same tf, shorter doc wins
  }

  test("Similarity.signWord packs sign bits little-endian") {
    import spark.implicits._
    // dims 0 and 2 positive within the first word -> bits 0,2 -> 5
    val vec = Array.fill(64)(-1.0)
    vec(0) = 1.0; vec(2) = 0.5; vec(33) = 3.0 // word1 bit 1 -> 2
    val df = Seq((1L, vec.toSeq)).toDF("id", "vec")
    val r = df.select(Similarity.signWord($"vec", 0).as("w0"),
      Similarity.signWord($"vec", 32).as("w1")).as[(Long, Long)].head()
    assert(r == ((5L, 2L)))
  }

  test("hammingTopK: exact integer distances, self excluded, ties by id") {
    import spark.implicits._
    def v(bits: Int*) = {
      val a = Array.fill(64)(-1.0)
      bits.foreach(b => a(b) = 1.0)
      a.toSeq
    }
    val vecs = Seq(
      (0L, v(0, 1, 2)), // query
      (1L, v(0, 1, 2)), // distance 0
      (2L, v(0, 1)), // distance 1
      (3L, v(40, 41)) // distance 5
    ).toDF("id", "vec")
    val out = Similarity.hammingTopK(vecs, vecs.filter($"id" === 0L), 3)
      .orderBy($"rank")
      .select($"neighbor_id", $"hamming").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((1L, 0), (2L, 1), (3L, 5)))
  }

  test("sortedNeighborhoodPairs finds adjacent near-dups, never crosses blocks") {
    import spark.implicits._
    val toks = Seq(
      // block "aa": 1 and 2 near-identical, sort adjacent
      (1L, Seq("aa", "bb", "cc", "dd", "ee", "ff")),
      (2L, Seq("aa", "bb", "cc", "dd", "ee", "gg")),
      // block "zz": identical content to doc 1 but different block
      (3L, Seq("zz", "bb", "cc", "dd", "ee", "ff"))
    ).toDF("id", "tokens")
    val pairs = Dedup.sortedNeighborhoodPairs(toks, 3, windowSize = 3, tau = 0.1)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // blocked apart
  }

  test("sortedNeighborhoodPairs matches brute force when the window covers the block") {
    import spark.implicits._
    // one block, window >= block size -> must equal all-pairs
    val toks = Seq(
      (1L, Seq("aa", "p", "q", "r", "s")),
      (2L, Seq("aa", "p", "q", "r", "t")),
      (3L, Seq("aa", "p", "q", "u", "v"))
    ).toDF("id", "tokens")
    val snm = Dedup.sortedNeighborhoodPairs(toks, 2, windowSize = 3, tau = 0.01)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val bf = Dedup.bruteForceJaccardPairs(toks, 2, 0.01)
      .select($"a", $"b", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(snm == bf)
  }

  test("matryoshka truncates, renormalizes to unit L2, and guards zero prefixes") {
    import spark.implicits._
    val vecs = Seq(
      (1L, (1 to 64).map(_.toDouble)),
      (2L, Seq.fill(16)(0.0) ++ (1 to 48).map(_.toDouble)) // zero prefix
    ).toDF("vec_id", "vec")
    val out = EmbeddingStats.matryoshka(vecs, "vec_id", "vec", 16)
      .orderBy($"vec_id")
      .select($"vec_id", $"norm", $"vec").as[(Long, Double, Seq[Double])].collect()
    val expNorm = math.sqrt((1 to 16).map(i => i.toDouble * i).sum)
    assert(math.abs(out(0)._2 - expNorm) < 1e-12)
    val unit = math.sqrt(out(0)._3.map(x => x * x).sum)
    assert(math.abs(unit - 1.0) < 1e-12)
    assert(out(0)._3.length == 16)
    // zero prefix: norm pinned to the guard, cells stay 0 (no NaN)
    assert(out(1)._2 == 1e-12 && out(1)._3.forall(_ == 0.0))
  }

  test("tfidfCosinePairs matches a hand-computed quantized cosine") {
    import spark.implicits._
    // "common" is in every doc (df=3 > 0.7*3) -> pruned before pairing;
    // "apple" (df=2 <= 2.1) survives; doc 3 shares nothing surviving.
    val docs = docsDf(
      1L -> "common apple apple pear",
      2L -> "common apple kiwi",
      3L -> "common mango")
    val out = Similarity.tfidfCosinePairs(docs, "doc_id",
      split($"text", " "), quantScale = 1e4, maxDfFrac = 0.7, tau = 0.0)
      .select($"a", $"b", $"cosine").as[(Long, Long, Double)].collect()
    // surviving vocab: apple(df2) pear(df1) kiwi(df1) mango(df1)
    def wq(tf: Long, df: Long) =
      BigDecimal(tf * math.log(3.0 / df) * 1e4)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val (wApple1, wApple2) = (wq(2, 2), wq(1, 2))
    val (wPear, wKiwi) = (wq(1, 1), wq(1, 1))
    val exp = BigDecimal(
      (wApple1 * wApple2).toDouble /
        (math.sqrt((wApple1 * wApple1 + wPear * wPear).toDouble) *
          math.sqrt((wApple2 * wApple2 + wKiwi * wKiwi).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq((1L, 2L, exp))) // doc 3: no shared surviving token
  }

  test("tfidfCosinePairs: identical docs score 1.0") {
    import spark.implicits._
    val docs = docsDf(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "x y z")
    val out = Similarity.tfidfCosinePairs(docs, "doc_id", split($"text", " "),
      1e4, maxDfFrac = 0.9, tau = 0.5)
      .select($"a", $"b", $"cosine").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("Rrf.fuse pivots per-ranker contributions; missing docs get +0.0") {
    import spark.implicits._
    val r1 = Seq((10L, 1L), (20L, 2L)).toDF("doc_id", "rnk")
    val r2 = Seq((20L, 1L), (30L, 2L)).toDF("doc_id", "rnk")
    val out = Rrf.fuse(Seq("a" -> r1, "b" -> r2), k = 60)
      .orderBy($"doc_id")
      .select($"doc_id", $"rrf_a", $"rrf_b", $"rrf_score")
      .as[(Long, Double, Double, Double)].collect()
    def c(r: Long) = BigDecimal(1.0 / (60.0 + r))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (10L, c(1), 0.0, c(1)),
      (20L, c(2), c(1), BigDecimal(c(2) + c(1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      (30L, 0.0, c(2), c(2))))
  }

  test("s16: matryoshka recall is nondecreasing in dims and exact at " +
    "full dimension") {
    val rows = graft.SparkEntry.queries("s16_matryoshka_recall")(
        spark, sf("sf0.001")).collect()
      .map(r => (r.getAs[Int]("dims"), r.getAs[Double]("recall")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32, 64))
    val recalls = rows.map(_._2).toSeq
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 1.0)
    assert(recalls.head < 1.0, "truncation to 8 dims lost nothing?")
  }

  test("ivfAdcTopK: full probe + perfect codebooks reproduce the exact " +
    "squared-distance ranking") {
    import spark.implicits._
    // Well-separated points so no float ulp can flip an ordering. With
    // nProbe = nClusters every list is probed, and with pqClusters = n
    // every residual subvector is its own codeword (zero quantization
    // error), so ADC must equal exact squared distance and the ranking
    // must match brute force.
    val data = Map(
      0L -> Seq(0.0, 0.0, 0.0, 0.0),
      1L -> Seq(10.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 10.0, 0.0, 0.0),
      3L -> Seq(10.0, 10.0, 10.0, 10.0))
    val vs = data.toSeq.sortBy(_._1).toDF("id", "vec")
    val qs = vs.where($"id" < 2).select($"id".as("qid"), $"vec")
    val got = Similarity.ivfAdcTopK(vs, qs, k = 4, nClusters = 2,
        nProbe = 2, coarseIters = 2, m = 2, subDim = 2, pqClusters = 4,
        pqIters = 2)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"rank", $"neighbor_id", $"adc")
      .as[(Long, Int, Long, Double)].collect()
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).toSeq == (1 to rows.length), s"query $q ranks")
      assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq,
        s"query $q adc order")
      assert(rows.forall(_._4 >= 0.0))
    }
    def sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (q <- Seq(0L, 1L)) {
      val want = data.keys.toSeq.sortBy(n => (sq(data(q), data(n)), n))
      val gotIds = got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq
      assert(gotIds == want, s"query $q: got $gotIds want $want")
    }
  }
}
