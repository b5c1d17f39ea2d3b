package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (the SentencePiece unigram model of
  * Kudo 2018, "Subword Regularization", §3 — hard-EM variant): seed a
  * candidate vocabulary from corpus substrings, then alternate
  * (E) Viterbi-segment every word type under the current piece
  * likelihoods and (M) re-estimate piece probabilities from the
  * segmentation counts. Pieces that win no Viterbi usage drop out —
  * hard-EM's built-in pruning. Complements BPE (t15/t16): same
  * word-TYPE reduction, but training is two MAP-ONLY passes instead of
  * a sequential merge loop, so it parallelizes perfectly.
  *
  * Scale shape: the only corpus-scale stage is the word-type frequency
  * aggregation (shared with [[Bpe.wordFrequencies]]); Heaps' law keeps
  * the type table vocabulary-sized at any corpus size. Substring
  * candidate counting is a narrow fan-out of the type table (x |word| x
  * maxLen rows) into one hash aggregate; top-V selection is a global
  * TakeOrdered on that bounded table. Each E-step is an embarrassingly
  * parallel map over word types with the (<= V + alphabet)-entry score
  * map broadcast — no shuffle beyond the closing usage count.
  *
  * Determinism (both engines replay bit-for-bit): piece scores are
  * nll = round(-ln(cnt/total), 6); Viterbi sums those 6dp doubles left
  * to right (identical operation order => identical IEEE results), the
  * backpointer takes the FIRST minimal predecessor scanning j
  * ascending, and missing pieces cost best(j) + 1e18 exactly as the
  * oracle's coalesce sentinel. Seed top-V ties break (cnt DESC, piece
  * ASC).
  */
object Unigram {

  /** Sentinel matching the oracle's coalesce(map_extract(...), 1e18). */
  private val Missing = 1e18

  /** Candidate substring counts: every substring of length 1..maxLen of
    * every word type, weighted by type frequency. Bounded by
    * |types| * avg_len * maxLen — a vocabulary-scale table.
    */
  def substringCounts(wordFreq: DataFrame, maxLen: Int): DataFrame =
    wordFreq.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
           |  i -> transform(sequence(1, least($maxLen, length(word) - i + 1)),
           |    l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** Seed vocabulary: ALL single characters (coverage guarantee) plus
    * the top `vocabSize` multi-char substrings by (cnt DESC, piece ASC).
    * Returns (piece, cnt).
    */
  def seedVocab(wordFreq: DataFrame, vocabSize: Int, maxLen: Int): DataFrame = {
    // no persist here: a one-shot consumer (one collect) gains nothing
    // from caching, and trainedScoresDF manages its own releasable cache
    val subs = substringCounts(wordFreq, maxLen)
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    singles.unionByName(multis)
  }

  /** (piece, cnt) -> (piece, nll) with nll = round(-ln(cnt/total), 6),
    * total summed over THIS table.
    */
  def scores(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), round(-log(col("cnt") / col("tot")), 6).as("nll"))
  }

  /** Viterbi segmentation of one word under a piece-score map: minimal
    * total nll, predecessors limited to the last maxLen characters,
    * first minimal predecessor wins ties (j ascending, strict <).
    */
  def segment(w: String, nll: collection.Map[String, Double],
      maxLen: Int): List[String] = {
    val n = w.length
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var p = 1
    while (p <= n) {
      var j = math.max(0, p - maxLen)
      var bc = Double.PositiveInfinity
      var bj = j
      while (j < p) {
        val c = best(j) + nll.getOrElse(w.substring(j, p), Missing)
        if (c < bc) { bc = c; bj = j }
        j += 1
      }
      best(p) = bc; back(p) = bj
      p += 1
    }
    var out = List.empty[String]
    var q = n
    while (q > 0) { out = w.substring(back(q), q) :: out; q = back(q) }
    out
  }

  /** E-step: per-piece usage counts (weighted by word-type frequency)
    * of the Viterbi segmentations under `pieceNll`. Map-only over the
    * type table + one hash aggregate.
    */
  def viterbiUsage(spark: SparkSession, wordFreq: DataFrame,
      pieceNll: Map[String, Double], maxLen: Int): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(pieceNll)
    wordFreq.select(col("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) => segment(w, bc.value, maxLen).map((_, f)) }
      .toDF("piece", "f")
      .groupBy(col("piece")).agg(sum(col("f")).as("n_used"))
  }

  /** Full hard-EM training: seed -> E1 -> M1 -> E2. Returns the final
    * tokenizer table (piece, n_used, nll): pieces the round-2 Viterbi
    * actually uses, their corpus-weighted usage, and the round-1
    * re-estimated score they were chosen under. The score maps are
    * bounded (<= vocabSize + alphabet) so the two collects are
    * dictionary-sized at ANY corpus scale.
    */
  def train(spark: SparkSession, wordFreq: DataFrame, vocabSize: Int,
      maxLen: Int): DataFrame = {
    val wf = ensureCached(wordFreq)
    val nll1df = trainedScoresDF(spark, wf, vocabSize, maxLen).persist()
    val u2 = viterbiUsage(spark, wf, collectScores(nll1df), maxLen)
    u2.join(nll1df, Seq("piece"))
      .select(col("piece"), col("n_used"), col("nll"))
  }

  /** The round-1 re-estimated score table (piece, nll) — the model the
    * final Viterbi segments under.
    */
  def trainedScoresDF(spark: SparkSession, wordFreq: DataFrame,
      vocabSize: Int, maxLen: Int): DataFrame = {
    // inline seedVocab so the substring-count cache can be RELEASED the
    // moment the seed scores are collected (nll0 is a local map; the
    // vocabulary-scale subs table has no further consumer) — seedVocab
    // itself stays persist-free for one-shot callers
    val subs = substringCounts(wordFreq, maxLen).persist()
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    val nll0 = collectScores(scores(singles.unionByName(multis)))
    subs.unpersist()
    scores(viterbiUsage(spark, wordFreq, nll0, maxLen)
      .withColumnRenamed("n_used", "cnt"))
  }

  /** The trained tokenizer as an encode dictionary, (word, n_sub):
    * pieces per word TYPE under the final model — the table fertility
    * audits broadcast-join back onto the corpus (mirrors
    * [[Bpe.subwordDict]] so the two tokenizers compare head-to-head).
    */
  def encodeDict(spark: SparkSession, wordFreq: DataFrame, vocabSize: Int,
      maxLen: Int): DataFrame = {
    import spark.implicits._
    val wf = ensureCached(wordFreq)
    val nll1 = collectScores(trainedScoresDF(spark, wf, vocabSize, maxLen))
    val bc = spark.sparkContext.broadcast(nll1)
    wf.select(col("word")).as[String]
      .map(w => (w, segment(w, bc.value, maxLen).length))
      .toDF("word", "n_sub")
  }

  private def collectScores(df: DataFrame): Map[String, Double] =
    // collect-bound: vocabulary: candidate-subword score table, width-capped by the trainer
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** persist() only if the caller hasn't already — a double persist is
    * a no-op plus a CacheManager warning per call (t25 passes an
    * already-cached word table into both tokenizers).
    */
  private def ensureCached(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    else df
}
