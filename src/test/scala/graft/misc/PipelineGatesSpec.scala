package graft.misc

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants of the round-6 pipeline-gate queries (a24 LM surprisal,
  * a25 Gopher rules, c21 token chunking, c22 temperature mixture) that
  * the hash oracle can't express directly: structural relationships
  * between columns, coverage of the chunk windows, and the rebalancing
  * direction of the temperature weights.
  */
class PipelineGatesSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("a24: surprisal is defined exactly for docs with >=2 tokens, " +
    "and n_bigrams = ntok - 1") {
    import spark.implicits._
    val got = run("a24_lm_surprisal")
    val ntok = graft.tables.Tables.documents(spark, dir)
      .select($"doc_id", size(graft.text.TextFunctions.tokenize($"text"))
        .cast("long").as("ntok"))
    val joined = got.join(ntok, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nb, nt) = (r.getAs[Long]("n_bigrams"), r.getAs[Long]("ntok"))
      assert(nb === math.max(nt - 1, 0L), s"doc ${r.get(0)}")
      val sNull = r.isNullAt(r.fieldIndex("surprisal"))
      assert(sNull === (nb == 0L), s"doc ${r.get(0)}")
      if (!sNull) assert(r.getAs[Double]("surprisal") > 0.0)
    }
  }

  test("a25: keep is the conjunction of the five gate bits") {
    val rows = run("a25_gopher_gates").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = Seq("g_word_count", "g_mean_word_len", "g_stopwords",
        "g_alpha_words", "g_symbols").map(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") === bits.forall(identity))
    }
  }

  test("c21: windows cover every token with stride-sized starts and " +
    "window-bounded lengths") {
    import spark.implicits._
    val (w, s) = (32, 24)
    val chunks = run("c21_chunk_windows")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"), max($"n_tokens").as("max_nt"),
        min($"n_tokens").as("min_nt"), max($"chunk_idx").as("last_idx"))
    val ntok = graft.tables.Tables.documents(spark, dir)
      .select($"doc_id", size(graft.text.TextFunctions.tokenize($"text"))
        .cast("long").as("ntok"))
      .where($"ntok" > 0)
    val joined = chunks.join(ntok, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nt = r.getAs[Long]("ntok")
      val expChunks = (nt - 1) / s + 1
      assert(r.getAs[Long]("n_chunks") === expChunks, s"doc ${r.get(0)}")
      assert(r.getAs[Long]("last_idx") === expChunks - 1)
      assert(r.getAs[Long]("max_nt") <= w)
      // the last chunk starts at (expChunks-1)*s < nt, so it is non-empty
      assert(r.getAs[Long]("min_nt") >= 1)
    }
    // every doc with tokens appears
    assert(joined.length ===
      ntok.count())
  }

  test("a26: selection follows the sign of the log-weight, and the " +
    "target-domain slice scores higher than the rest") {
    val rows = run("a26_dsir_weights").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lwNull = r.isNullAt(r.fieldIndex("log_weight"))
      val sel = r.getAs[Boolean]("selected")
      if (lwNull) assert(!sel)
      else assert(sel === (r.getAs[Double]("log_weight") > 0.0))
    }
    val scored = rows.filter(!_.isNullAt(2)).filter(!_.isNullAt(3))
    def mean(p: Seq[Double]) = p.sum / p.length
    val en = scored.filter(_.getAs[String]("lang") == "en")
      .map(_.getAs[Double]("log_weight")).toSeq
    val rest = scored.filter(_.getAs[String]("lang") != "en")
      .map(_.getAs[Double]("log_weight")).toSeq
    assert(en.nonEmpty && rest.nonEmpty)
    // the importance weight must rank the target domain above the pool
    assert(mean(en) > mean(rest),
      s"mean en=${mean(en)} vs rest=${mean(rest)}")
  }

  test("a27: terciles are balanced within 1 doc and ordered by surprisal") {
    val rows = run("a27_ccnet_buckets").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, g) =>
      val byBucket = g.map(r =>
        r.getAs[String]("bucket") -> r.getAs[Long]("n_docs")).toMap
      val n = byBucket.values.sum
      byBucket.values.foreach(c =>
        assert(math.abs(c - n / 3.0) <= 1.0, s"$lang unbalanced: $byBucket"))
      // head is the most fluent (lowest-surprisal) slice
      def mean(b: String) = g.find(_.getAs[String]("bucket") == b)
        .map(_.getAs[Double]("mean_surprisal"))
      for (h <- mean("head"); m <- mean("middle"); t <- mean("tail")) {
        assert(h <= m && m <= t, s"$lang: head=$h middle=$m tail=$t")
      }
    }
  }

  test("c23: each epoch is a full, distinct, reproducible permutation") {
    val a = run("c23_epoch_shuffle").collect()
    val byEpoch = a.groupBy(_.getAs[Long]("epoch"))
      .map { case (e, rs) => e -> rs.map(_.getAs[Long]("doc_id")).toSeq }
    assert(byEpoch.keySet === Set(0L, 1L))
    // every doc appears exactly once per epoch
    assert(byEpoch(0L).sorted === byEpoch(1L).sorted)
    assert(byEpoch(0L).distinct.length === byEpoch(0L).length)
    // the two epochs order the corpus differently
    assert(byEpoch(0L) !== byEpoch(1L))
    // re-running yields the identical sequence (the reproducibility
    // contract that df.sample cannot give)
    val b = run("c23_epoch_shuffle").collect()
      .groupBy(_.getAs[Long]("epoch"))
      .map { case (e, rs) => e -> rs.map(_.getAs[Long]("doc_id")).toSeq }
    assert(byEpoch === b)
  }

  test("decimal-summed scores are bit-identical under different " +
    "shuffle partitionings") {
    // the queries CLAIM partition-order-proof aggregation (rounded
    // terms summed in DECIMAL); prove it by executing under 1 vs 7
    // shuffle partitions and requiring byte-equal row sets
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    def snapshot(name: String): Seq[String] =
      run(name).collect().map(_.toString).sorted.toSeq
    try {
      for (name <- Seq("a24_lm_surprisal", "c22_temperature_mixture",
        "e07_mmd_drift")) {
        conf.set("spark.sql.shuffle.partitions", "1")
        val one = snapshot(name)
        conf.set("spark.sql.shuffle.partitions", "7")
        val seven = snapshot(name)
        assert(one === seven, s"$name diverges across partitionings")
      }
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }

  test("representative gate queries are AQE-invariant") {
    // AQE re-plans shuffles at runtime (coalesced partitions, skew
    // splits, join-strategy switches) — none of which may move a row
    // or an ulp. Pin it on a shuffle-heavy sample: LSH banding + window
    // (d04), the curation composition (c01), grouped decimal means
    // (a23), converged star rounds (d18).
    val conf = spark.conf
    val before = conf.get("spark.sql.adaptive.enabled")
    def snap(name: String): Seq[String] =
      run(name).collect().map(_.toString).sorted.toSeq
    try {
      for (name <- Seq("d04_minhash_neardup", "c01_curated_docs",
        "a23_tokenizer_fertility", "d18_neardup_components")) {
        conf.set("spark.sql.adaptive.enabled", "true")
        val on = snap(name)
        conf.set("spark.sql.adaptive.enabled", "false")
        val off = snap(name)
        assert(on === off, s"$name diverges under AQE")
        assert(on.nonEmpty)
      }
    } finally conf.set("spark.sql.adaptive.enabled", before)
  }

  test("c22: weights sum to 1 and upsample low-resource languages") {
    val rows = run("c22_temperature_mixture").collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4)
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    // temperature < 1 compresses shares: every language's weight sits
    // between its raw share and the uniform share
    rows.foreach { r =>
      val raw = r.getAs[Long]("n_docs") / total
      val uni = 1.0 / rows.length
      val wgt = r.getAs[Double]("weight")
      val (lo, hi) = if (raw < uni) (raw, uni) else (uni, raw)
      assert(wgt >= lo - 1e-6 && wgt <= hi + 1e-6,
        s"${r.getAs[String]("lang")}: raw=$raw uniform=$uni weight=$wgt")
    }
  }

  test("a29: the distilled classifier beats the base rate and separates " +
    "both classes") {
    val rows = run("a29_lr_quality").collect()
    assert(rows.nonEmpty)
    var acc, pos = 0
    val preds = scala.collection.mutable.Set.empty[Boolean]
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      val pred = r.getAs[Boolean]("pred")
      assert(score >= 0.0 && score <= 1.0)
      assert(pred === (score >= 0.5))
      preds += pred
      val label = r.getAs[Int]("label")
      if (label == 1) pos += 1
      if ((label == 1) == pred) acc += 1
    }
    // 6 GD rounds must actually LEARN the gate: strictly better than
    // predicting the majority class everywhere, and well above 90%.
    assert(preds.size === 2, "classifier collapsed to one class")
    assert(acc > math.max(pos, rows.length - pos), s"acc=$acc pos=$pos")
    assert(acc.toDouble / rows.length >= 0.9)
  }

  test("c27: weights are a positive distribution, monotone in excess " +
    "loss") {
    val rows = run("c27_doremi_weights").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("excess"),
        r.getAs[Double]("weight")))
    assert(rows.length >= 2)
    rows.foreach { case (s, _, w) => assert(w > 0.0, s"source $s") }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3,
      s"weights sum to ${rows.map(_._3).sum}")
    // exp is increasing: sorting by excess must sort by weight
    val byExcess = rows.sortBy(_._2).map(_._3).toSeq
    assert(byExcess == byExcess.sorted, "weight not monotone in excess")
  }
}
