package graft.baseline

import breeze.linalg.{svd => bsvd, DenseMatrix}

import graft.text.{StopWords, TextFunctions}

/** Driver-local LSA baseline summarizer equivalent to the reference's
  * external `pytldr` `LsaSummarizer` (BigdataProjectCode.py:167-176,
  * SURVEY V1/H3), rebuilt from the published algorithms it implements
  * (Steinberger & Ježek 2004; Ozsoy et al. 2010):
  *
  *  1. binary term×sentence matrix (with `binary_matrix=True`) over
  *     stopword-filtered alphabetic tokens;
  *  2. SVD (Breeze, local — a single document's sentences always fit);
  *  3. keep at most `topics` concepts and drop concepts whose singular
  *     value is below `topicSigmaThreshold * σ_max`;
  *  4. sentence score = sqrt(Σ_j σ_j² · v_ij²) over surviving concepts
  *     (the Steinberger-Ježek "enhanced" length score);
  *  5. top `length` sentences, returned in original document order.
  *
  * `length` ∈ (0,1] is interpreted as a fraction of the sentence count,
  * matching pytldr's API; integers select an absolute count.
  */
object OzsoyLsaSummarizer {

  final case class Scored(index: Int, sentence: String, score: Double)

  def tokenize(sentence: String): Seq[String] =
    "[a-zA-Z]+".r.findAllIn(sentence.toLowerCase).toSeq
      .filterNot(StopWords.asSet.contains)

  /** Score every sentence; no selection. */
  def scoreSentences(sentences: Seq[String], topics: Int = 15,
      topicSigmaThreshold: Double = 0.75): Seq[Scored] = {
    val toks = sentences.map(tokenize)
    val vocab = toks.flatten.distinct.sorted.zipWithIndex.toMap
    if (vocab.isEmpty || sentences.isEmpty)
      return sentences.zipWithIndex.map { case (s, i) => Scored(i, s, 0.0) }

    // binary term x sentence matrix
    val m = DenseMatrix.zeros[Double](vocab.size, sentences.size)
    toks.zipWithIndex.foreach { case (ts, j) =>
      ts.foreach(t => m(vocab(t), j) = 1.0)
    }
    val r = bsvd.reduced(m)
    val sigma = r.S.toArray
    val vt = r.Vt // (min(t,s)) x sentences
    val sMax = if (sigma.nonEmpty) sigma.max else 0.0
    val keep = sigma.indices.filter(j =>
      j < topics && sigma(j) >= topicSigmaThreshold * sMax)

    sentences.indices.map { i =>
      val score = math.sqrt(keep.map { j =>
        val x = sigma(j) * vt(j, i)
        x * x
      }.sum)
      Scored(i, sentences(i), score)
    }
  }

  /** Select the summary: top sentences by score, original order. */
  def summarize(sentences: Seq[String], topics: Int = 15,
      length: Double = 15, topicSigmaThreshold: Double = 0.75): Seq[String] = {
    val scored = scoreSentences(sentences, topics, topicSigmaThreshold)
    // strictly-below-1 means a fraction; >= 1 is an absolute count
    // (length = 1 must select ONE sentence, not the whole document)
    val n =
      if (length > 0 && length < 1) math.max(1, math.round(length * sentences.size).toInt)
      else math.min(length.toInt, sentences.size)
    scored.sortBy(s => (-s.score, s.index)).take(n)
      .sortBy(_.index).map(_.sentence)
  }
}
