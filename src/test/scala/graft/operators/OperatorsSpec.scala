package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("lazy", "sleepy")), // near dup
    (3L, "completely different content about spark clusters and shuffles here"),
    (4L, "  THE  quick brown fox jumps over the lazy dog again and again today ") // normalized dup of 0
  ).toDF("doc_id", "text")

  private def toks = docs.select($"doc_id".as("id"),
    graft.text.TextFunctions.tokenize($"text").as("tokens"))

  test("exact clusters catch normalized duplicates") {
    val c = Dedup.exactClusters(docs, "doc_id", "text")
      .filter($"n_docs" > 1).collect()
    assert(c.length == 1)
    assert(c.head.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq == Seq(0L, 1L, 4L))
  }

  test("brute-force jaccard finds near + exact dup pairs") {
    val pairs = Dedup.bruteForceJaccardPairs(toks, 3, 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 2L))) // near dup above 0.5
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-LSH recovers the brute-force pairs on planted dups") {
    val brute = Dedup.bruteForceJaccardPairs(toks, 3, 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDuplicates(toks, 3, 32, 8, 0.5)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(lsh == brute) // high-similarity pairs: recall 1 at b=8,r=4
  }

  test("simhash: identical token lists collide at hamming 0") {
    val pairs = Dedup.simhashNearDuplicates(toks, maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val h = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(h((0L, 1L)) == 0)
    assert(h((0L, 4L)) == 0)
  }

  test("cosine near-dup on orthogonal vs identical vectors") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.9, 0.1, 0.0))).toDF("id", "vec")
    val pairs = Dedup.cosineNearDuplicates(vecs, 0.95)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("edit-distance banding equals the naive quadratic on random keys") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde"
    val keys = (1 to 150).map { i =>
      val len = 5 + rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(5))).mkString)
    }
    val df = keys.toDF("id", "key")
    for (k <- Seq(2, 5)) {
      val fast = Dedup.editDistanceNearDuplicates(df, k)
        .select($"a", $"b", $"dist").as[(Long, Long, Int)].collect().toSet
      val naive = (for {
        (ia, ka) <- keys; (ib, kb) <- keys if ia < ib
        d = levenshteinRef(ka, kb) if d <= k
      } yield (ia, ib, d)).toSet
      assert(fast === naive, s"k=$k")
    }
  }

  /** Straight Wagner-Fischer reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("label propagation clusters a chain and keeps components apart") {
    // chain 5-3-7 plus pair (10,12); 9 appears nowhere -> absent
    val pairs = Seq((5L, 3L), (3L, 7L), (10L, 12L)).toDF("a", "b")
    val out = Dedup.labelPropagationClusters(pairs, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 10L -> 10L, 12L -> 10L))
  }

  test("label propagation labels a diameter-k chain in k rounds") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    // diameter 3: node 4 is 3 hops from node 1
    val k3 = Dedup.labelPropagationClusters(chain, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(k3.values.toSet == Set(1L))
    // 1 round is not enough for the far end — fixed-iteration semantics
    val k1 = Dedup.labelPropagationClusters(chain, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(k1(4L) == 3L && k1(2L) == 1L)
  }

  test("alternating-star components converge on a long chain where " +
    "fixed-3-round propagation cannot") {
    // diameter-9 chain: min-label needs 9 rounds, the star rounds O(log)
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(cc == (1L to 10L).map(_ -> 1L).toMap)
    val k3 = Dedup.labelPropagationClusters(chain, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(k3(10L) != 1L, "3 fixed rounds must NOT close a 9-hop chain " +
      "(else the d07/d18 distinction is vacuous)")
  }

  test("alternating-star components equal a plain union-find reference") {
    // fully Spark-independent oracle: disjoint-set union with the
    // smaller root absorbing the larger, so each final root IS the
    // component min — the contract connectedComponents promises
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val n = 50
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"trial=$trial")
    }
  }

  test("alternating-star components equal graphx full convergence on " +
    "random graphs, in both convergence-check modes") {
    val rnd = new scala.util.Random(23)
    for (seed <- 1 to 3) {
      val pairs = Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(p => p._1 != p._2).distinct
        .toDF("a", "b")
      val cc = Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toSet
      // 60 rounds >= any diameter here: pregel min-label at fixpoint
      val gx = Dedup.labelPropagationClustersGraphX(pairs, 60)
        .as[(Long, Long)].collect().toSet
      assert(cc == gx, s"seed=$seed")
      // the signature-based (100 TB) convergence check lands on the
      // same fixpoint as the exact except-based one
      val sig = Dedup.connectedComponents(pairs, exactConvergence = false)
        .as[(Long, Long)].collect().toSet
      assert(sig == cc, s"seed=$seed signature-mode diverged")
    }
  }

  test("repeated-span stats count corpus-wide duplicated k-gram positions") {
    // k=5 grams; "abcdefgh" appears in docs 20 and 21, so every one of
    // its 4 positions is duplicated in both; doc 22 shares nothing of
    // length 5; doc 23 is shorter than k -> zero positions; doc 24
    // repeats a 5-gram WITHIN itself ("xyzvw...xyzvw"), which also
    // counts (corpus-wide occurrences >= 2 includes same-doc repeats).
    val docs = Seq(
      (20L, "abcdefgh"), (21L, "abcdefgh"), (22L, "qqqq1234"),
      (23L, "abc"), (24L, "xyzvw--xyzvw")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpanStats(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(20L) == ((4L, 4L, 1.0)))
    assert(out(21L) == ((4L, 4L, 1.0)))
    assert(out(22L) == ((4L, 0L, 0.0)))
    assert(out(23L) == ((0L, 0L, 0.0)))
    // doc 24: positions 1..8; only "xyzvw" (position 1 vs 8) repeats
    assert(out(24L)._1 == 8L && out(24L)._2 == 2L)
  }

  test("cross-doc duplicated-n-gram rate counts occurrences, not types") {
    // word 2-grams: "a b" lives in docs 30 (TWICE) and 31 -> both of
    // doc 30's occurrences count (occurrence semantics); doc 32 shares
    // nothing; doc 33 is shorter than n and drops out of the output.
    val docs = Seq(
      (30L, "a b c a b"), (31L, "a b x y"), (32L, "p q r s"), (33L, "z")
    ).toDF("doc_id", "text")
    val out = Dedup.dupGramRate(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(30L) == ((4L, 2L, 0.5)))
    assert(out(31L) == ((3L, 1L, 0.333333)))
    assert(out(32L) == ((3L, 0L, 0.0)))
    assert(!out.contains(33L))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("language id votes on real sentences") {
    val df = Seq(
      (0L, "the cat is in the house and it is warm"),
      (1L, "le chat est dans la maison et il est chaud"),
      (2L, "el gato es bueno y la casa es grande"),
      (3L, "der Hund ist in dem Haus und die Katze"),
      (4L, "你好世界"), // CJK chars -> zh
      (5L, "xyzzy plugh")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.languageId($"text").as("g"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "en")
    assert(got(1L) == "fr")
    assert(got(2L) == "es")
    assert(got(3L) == "de")
    assert(got(4L) == "zh")
    assert(got(5L) == "und")
  }

  test("language purity flags code-switched documents") {
    // doc 0: both sentences English -> purity 1.0; doc 1: one English
    // + one French sentence -> the doc-level vote goes to whichever
    // lexicon wins overall, and exactly one sentence agrees -> 0.5.
    val docs = Seq(
      (0L, "the cat is in the house. it is warm and the dog is here."),
      (1L, "the cat is in the house and it is warm. le chat est dans la maison et il est la.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languagePurity(docs, "doc_id", "text")
      .select($"doc_id", $"purity").as[(Long, Double)].collect().toMap
    assert(out(0L) == 1.0)
    assert(out(1L) == 0.5)
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq((0L, "Hello, world! It's 2024.")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.wsTokenCount($"text").as("ws"),
      TextAnalysis.bpeishTokenCount($"text").as("bpe"))
      .as[(Int, Int)].collect().head
    assert(r._1 == 4)
    // Hello , world ! It ' s 2024 . -> 9
    assert(r._2 == 9)
  }

  test("ratios on a crafted string") {
    val df = Seq((0L, "ab cd!!")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.punctRatio($"text").as("p"),
      TextAnalysis.digitRatio($"text").as("d"))
      .as[(Double, Double)].collect().head
    assert(math.abs(r._1 - 2.0 / 7) < 1e-12)
    assert(r._2 == 0.0)
  }

  test("fingerprint is deterministic and content-sensitive") {
    val df = Seq((0L, "abc"), (1L, "abc"), (2L, "abd")).toDF("id", "text")
    val fp = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("redaction replaces urls, emails and phones with typed tags") {
    val rows = Seq(
      (0L, "mail me at a.b+c@ex-ample.org or call 555-123-4567 now"),
      (1L, "see https://ex.com/a?u=x@y.zz and http://b.io plain"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val out = rows.select($"doc_id", TextAnalysis.redact($"text").as("r"),
        TextAnalysis.piiCounts($"text").as("p"))
      .select($"doc_id", $"r", $"p.n_urls", $"p.n_emails", $"p.n_phones")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "mail me at <EMAIL> or call <PHONE> now")
    assert((out(0)._4, out(0)._5) == (1, 1))
    // the URL swallows the embedded @; email count is 0 post-URL-redact
    assert(out(1)._2 == "see <URL> and <URL> plain")
    assert((out(1)._3, out(1)._4) == (2, 0))
    assert(out(2)._2 == "no pii here" && (out(2)._3, out(2)._4, out(2)._5) == (0, 0, 0))
  }

  test("graphx label propagation equals the dataframe loop on random graphs") {
    val rnd = new scala.util.Random(11)
    for (k <- Seq(1, 3)) {
      val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2).distinct
        .toDF("a", "b")
      val df = Dedup.labelPropagationClusters(pairs, k)
        .as[(Long, Long)].collect().toSet
      val gx = Dedup.labelPropagationClustersGraphX(pairs, k)
        .as[(Long, Long)].collect().toSet
      assert(gx == df, s"k=$k")
    }
  }

  test("token entropy: uniform, skewed, single-token, empty") {
    val df = Seq(
      (0L, Seq("a", "b", "c", "d")),        // uniform -> 2 bits
      (1L, Seq("a", "a", "a", "b")),        // skewed
      (2L, Seq("a", "a", "a")),             // single type -> +0.0
      (3L, Seq.empty[String]))              // empty -> 0.0
      .toDF("id", "tk")
    val got = df.select($"id", TextAnalysis.tokenEntropy($"tk").as("h"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(0L) - 2.0) < 1e-12)
    val expSkew = 0.75 * math.log(4.0 / 3.0) / math.log(2.0) + 0.25 * 2.0
    assert(math.abs(got(1L) - expSkew) < 1e-12)
    assert(got(2L) == 0.0)
    // the +0.0 pin: string form must not be "-0.0"
    assert(got(2L).toString == "0.0")
    assert(got(3L) == 0.0)
  }

  test("intHistogram: integer edges, constant column, full coverage") {
    val df = (0L until 100L).map(i => Tuple1(i)).toSeq.toDF("x")
    val h = Profiler.intHistogram(df, "x", 10)
      .orderBy($"bucket").as[(Int, Long, Long, Long)].collect()
    assert(h.length == 10)
    assert(h.map(_._4).sum == 100)         // every row lands in a bucket
    assert(h.head == ((0, 0L, 9L, 10L)))   // width (99-0)/10+1 = 10
    assert(h.last == ((9, 90L, 99L, 10L)))
    // constant column: one bucket, width 1
    val c = Seq(5L, 5L, 5L).toDF("x")
    val hc = Profiler.intHistogram(c, "x", 10)
      .as[(Int, Long, Long, Long)].collect()
    assert(hc.toSeq == Seq((0, 5L, 5L, 3L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)),
    (3L, Seq(-1.0, 0.0)), (4L, Seq(0.7, 0.7))).toDF("id", "vec")

  test("brute-force top-k ranks by cosine") {
    val r = Similarity.bruteForceTopK(vecs, vecs.filter($"id" === 0), 2)
      .select($"rank", $"neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(r.map(_._2).toSeq == Seq(1L, 4L))
  }

  test("ivf with full probe equals brute force exactly") {
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"id" === 0), 3)
      .select($"rank", $"neighbor_id", $"cosine").as[(Int, Long, Double)]
      .collect().toSeq
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"id" === 0), 3,
      nClusters = 2, nProbe = 2, seed = 11L) // probe ALL clusters
      .select($"rank", $"neighbor_id", $"cosine").as[(Int, Long, Double)]
      .collect().toSeq
    assert(ivf == brute)
    // quantizer-independence: the deterministic Lloyd variant too
    val det = Similarity.ivfTopKDeterministic(vecs, vecs.filter($"id" === 0),
      3, nClusters = 2, nProbe = 2)
      .select($"rank", $"neighbor_id", $"cosine").as[(Int, Long, Double)]
      .collect().toSeq
    assert(det == brute)
  }

  test("deterministic lloyd ivf is run-to-run stable") {
    def run() = Similarity.ivfTopKDeterministic(vecs,
        vecs.filter($"id" < 2), 3, nClusters = 2, nProbe = 1)
      .as[(Long, Int, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val a = run()
    assert(a.nonEmpty)
    assert(a == run())
  }

  test("cluster-balanced sampling keeps min(quota, cluster size) per cluster") {
    // two tight clusters of very different sizes; quota 3 caps the big
    // one and keeps the small one whole — the balancing property a
    // frequency-proportional sample would break
    val rnd = new scala.util.Random(11)
    val many = ((0L until 20L).map(i =>
      (i, Seq(1.0 + rnd.nextDouble() * 0.01, 0.0))) ++
      (20L until 24L).map(i =>
        (i, Seq(0.0, 1.0 + rnd.nextDouble() * 0.01)))).toDF("id", "vec")
    val kept = Similarity.clusterBalancedSample(many, nClusters = 2,
        lloydIters = 2, quota = 3)
      .select($"n_total", $"n_kept").as[(Long, Long)].collect().toMap
    assert(kept.keySet == Set(20L, 4L))
    assert(kept(20L) == 3L) // capped at quota
    assert(kept(4L) == 3L)  // min(quota, 4) = 3
  }

  test("recallAtK: truth drives, missed queries score 0, extras don't inflate") {
    val truth = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((0L, 1L), (0L, 3L), (0L, 9L)) // q1 entirely missed
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(truth, approx)
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(0L) == ((3L, 2L, 0.666667)))
    assert(r(1L) == ((2L, 0L, 0.0)))
    // duplicate key rows (a pre-dedup candidate list) must not inflate
    // either count: (0,1) twice in approx, (0,2) twice in truth
    val r2 = Similarity.recallAtK(
        truth.unionAll(Seq((0L, 2L)).toDF("query_id", "neighbor_id")),
        approx.unionAll(Seq((0L, 1L)).toDF("query_id", "neighbor_id")))
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r2(0L) == ((3L, 2L, 0.666667)))
  }

  test("lsh band layouts over shared planes have nested candidates: recall is monotone") {
    // A band match under (b, r) forces its sub-bands to match under
    // (2b, r/2) — candidates nest, and since the re-rank is by exact
    // cosine, a true top-k neighbor that is a candidate always stays in
    // the candidate top-k. So recall must be non-decreasing from 2x8
    // to 4x4 to 8x2 over the SAME 16 hyperplanes.
    val rnd = new scala.util.Random(7)
    val many = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))).toDF("id", "vec")
    val q = many.filter($"id" < 6)
    val truth = Similarity.bruteForceTopK(many, q, 5)
    def hits(b: Int, r: Int): Long =
      Similarity.recallAtK(truth,
        Similarity.lshTopK(many, q, 5, bands = b, rowsPerBand = r,
          seed = 42L, dim = 8))
        .agg(sum($"n_hit")).as[Long].head()
    val h = Seq(hits(2, 8), hits(4, 4), hits(8, 2))
    assert(h == h.sorted, s"recall not monotone across band layouts: $h")
    assert(h.last > 0L)
  }

  test("lsh top-k finds the near-identical neighbor at rank 1") {
    val r = Similarity.lshTopK(vecs, vecs.filter($"id" === 0), 2,
      bands = 8, rowsPerBand = 2, seed = 7L, dim = 2)
      .select($"rank", $"neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(r.nonEmpty && r.head._2 == 1L)
  }

  test("pq codes quantize each subspace independently") {
    // two exact patterns per 2-dim subspace, swapped between halves:
    // both subspace codebooks converge onto the patterns -> zero error
    val pq = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),
      (1L, Seq(10.0, 10.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 10.0, 10.0)),
      (3L, Seq(10.0, 10.0, 0.0, 0.0))
    ).toDF("id", "vec")
    val out = Similarity.pqCodes(pq, m = 2, subDim = 2, nClusters = 2,
      lloydIters = 2)
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 0, 0, 0.0), (1L, 1, 1, 0.0), (2L, 0, 0, 0.0), (3L, 1, 1, 0.0)))

    // ADC against exact codebooks reproduces exact distances:
    // id0 to itself/id2 = 0; to id1/id3 = 2*(2*10^2) = 400
    val adc = Similarity.pqAdcTopK(pq,
      pq.filter($"id" === 0).select($"id".as("qid"), $"vec"),
      k = 4, m = 2, subDim = 2, nClusters = 2, lloydIters = 2)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    assert(adc == Seq(
      (0L, 1, 0L, 0.0), (0L, 2, 2L, 0.0),
      (0L, 3, 1L, 400.0), (0L, 4, 3L, 400.0)))
  }

  test("hits concentrates authority on the pointed-at vertex") {
    // star 1→3, 2→3: authority = (0,0,1), hubs = (1/√2, 1/√2, 0),
    // stable from round 1 on
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Hits.hits(edges, iters = 3)
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 0.707107, 0.0), (2L, 0.707107, 0.0), (3L, 0.0, 1.0)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media schema + decode stub preserves rows and derives features") {
    val docs = Seq((0L, "abcd", "en"), (1L, "x" * 300, "fr"), (2L, "", "es"))
      .toDF("doc_id", "text", "lang")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val out = Multimodal.decodeStub(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3)
    assert(out(0L).getLong(2) == 4L) // n_bytes
    assert(out(0L).getInt(3) == 1) // n_frames = ceil(4/256)
    assert(out(1L).getInt(3) == 2) // ceil(300/256)
    assert(out(2L).getLong(2) == 0L)
    val feat = out(0L).getSeq[Double](5)
    assert(feat.length == 4 && feat.head == 4.0)
  }

  test("dHash stub sets bit i iff byte i+1 > byte i, zero-padded tail") {
    // "ab" -> bytes 97,98: bit0 = (98>97) = 1; bit1 = (0>98) = 0; rest 0
    // "ba" -> 98,97: bit0 = 0; all others compare zeros -> 0
    val docs = Seq((0L, "ab", "en"), (1L, "ba", "en"), (2L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Multimodal.dHashStub(Multimodal.asMedia(docs, "doc_id", "text"))
      .select($"id", $"dhash").as[(Long, Long)].collect().toMap
    assert(out(0L) == 1L && out(1L) == 0L && out(2L) == 0L)
    // 60-bit budget: a long ascending run sets bits 0..59 only, so the
    // value stays positive (no sign-bit surprises across engines)
    val asc = (32 to 126).map(_.toChar).mkString
    val full = Multimodal.dHashStub(Multimodal.asMedia(
      Seq((9L, asc, "en")).toDF("doc_id", "text", "lang"),
      "doc_id", "text"))
      .select($"dhash").as[Long].head()
    assert(full == (1L << 60) - 1 && full > 0)
  }

  test("audio energy windows are integer-exact") {
    val media = Multimodal.asMedia(
      Seq((1L, "abc"), (4L, "a" * 161)).toDF("doc_id", "text"),
      "doc_id", "text")
    val rows = Multimodal.audioEnergyStub(media)
      .select($"id", $"win", $"n", $"sumsq")
      .as[(Long, Int, Long, Long)].collect().toSet
    // 'a'=97, 'b'=98, 'c'=99 -> 97²+98²+99² = 28814; 161×'a' splits
    // into a full 160-byte window and a 1-byte tail
    assert(rows == Set(
      (1L, 0, 3L, 28814L),
      (4L, 0, 160L, 160L * 97 * 97), (4L, 1, 1L, 97L * 97)))
  }

  test("decode stub checksum is deterministic") {
    val docs = Seq((0L, "hello", "en")).toDF("doc_id", "text", "lang")
    def run() = Multimodal.decodeStub(Multimodal.asMedia(docs, "doc_id", "text"))
      .select($"checksum").as[Long].collect().head
    assert(run() == run())
  }
}
