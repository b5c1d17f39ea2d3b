package graft.baseline

import breeze.linalg.{svd => bsvd, DenseMatrix}

import graft.text.StopWords

/** Driver-local LSA baseline summarizer equivalent to the reference's
  * external `pytldr` `LsaSummarizer` (BigdataProjectCode.py:167-176,
  * SURVEY V1/H3), rebuilt from the published algorithms it implements
  * (Ozsoy et al. 2010 "cross method"; Steinberger & Ježek 2004).
  *
  * pytldr's `LsaSummarizer` IS the Ozsoy cross-method object (the
  * reference's own comment at BigdataProjectCode.py:168), so the cross
  * method is the parity default here; the Steinberger-Ježek "enhanced
  * length" score is preserved alongside as [[scoreSentencesSteinberger]].
  *
  * Shared pipeline:
  *  1. binary term×sentence matrix (`binary_matrix=True`) over
  *     stopword-filtered alphabetic tokens;
  *  2. SVD (Breeze, local — a single document's sentences always fit),
  *     top `topics` concepts by singular value;
  *  3. concepts with σ_j < topicSigmaThreshold·σ_max are zeroed out.
  *
  * Cross method (steps from Ozsoy et al. 2010 §3.3):
  *  4. per-topic average sentence loading; cells ≤ the topic average are
  *     zeroed (drops weakly-related sentences from each concept);
  *  5. sentence saliency = Σ_j σ_j² · v_ij² over the surviving cells —
  *     the "cross" of concept strength and sentence loading.
  *
  * Steinberger-Ježek:
  *  4'. sentence score = sqrt(Σ_j σ_j² · v_ij²) with no cell zeroing.
  *
  * Determinism: SVD singular-vector signs are implementation-defined, so
  * each concept row of Vᵀ is flipped to make its max-|loading| entry
  * positive (the same Q9/H2 convention as `graft.lsa.Lsa`) before the
  * sign-sensitive cross thresholding.
  *
  * `length` ∈ (0,1) is interpreted as a fraction of the sentence count,
  * matching pytldr's API; values ≥ 1 select an absolute count.
  */
object OzsoyLsaSummarizer {

  final case class Scored(index: Int, sentence: String, score: Double)

  def tokenize(sentence: String): Seq[String] =
    "[a-zA-Z]+".r.findAllIn(sentence.toLowerCase).toSeq
      .filterNot(StopWords.asSet.contains)

  /** Binary term×sentence matrix → (σ descending, sign-fixed Vᵀ rows for
    * the top-`topics` concepts). None when the corpus is degenerate.
    */
  private def decompose(sentences: Seq[String],
      topics: Int): Option[(Array[Double], Array[Array[Double]])] = {
    val toks = sentences.map(tokenize)
    val vocab = toks.flatten.distinct.sorted.zipWithIndex.toMap
    if (vocab.isEmpty || sentences.isEmpty) return None

    val m = DenseMatrix.zeros[Double](vocab.size, sentences.size)
    toks.zipWithIndex.foreach { case (ts, j) =>
      ts.foreach(t => m(vocab(t), j) = 1.0)
    }
    val r = bsvd.reduced(m)
    val sigma = r.S.toArray // descending
    val vt = r.Vt // min(t,s) x sentences
    val k = math.min(topics, sigma.length)
    val v = Array.tabulate(k) { j =>
      // sign convention: max-|loading| sentence entry positive
      var best = 0.0; var sign = 1.0
      (0 until sentences.size).foreach { i =>
        val x = vt(j, i)
        if (math.abs(x) > best) { best = math.abs(x); sign = if (x < 0) -1.0 else 1.0 }
      }
      Array.tabulate(sentences.size)(i => sign * vt(j, i))
    }
    Some((sigma.take(k), v))
  }

  private def zeroed(sentences: Seq[String]): Seq[Scored] =
    sentences.zipWithIndex.map { case (s, i) => Scored(i, s, 0.0) }

  /** Ozsoy cross-method sentence scores — the pytldr `LsaSummarizer`
    * parity path. No selection.
    */
  def scoreSentences(sentences: Seq[String], topics: Int = 15,
      topicSigmaThreshold: Double = 0.75): Seq[Scored] =
    decompose(sentences, topics) match {
      case None => zeroed(sentences)
      case Some((sigma, v)) =>
        val n = sentences.size
        val k = sigma.length
        // 4. per-topic average loading; zero cells <= the average
        //    (computed BEFORE the sigma cut, as in the published method)
        val vCut = v.map { row =>
          val avg = row.sum / n
          row.map(x => if (x <= avg) 0.0 else x)
        }
        // 3. zero out weak concepts
        val sMax = if (k > 0) sigma.max else 0.0
        val sig = sigma.map(s => if (s < topicSigmaThreshold * sMax) 0.0 else s)
        // 5. saliency = sigma² · v² (no sqrt — that is the Steinberger form)
        sentences.indices.map { i =>
          val score = (0 until k).map { j =>
            val x = sig(j) * vCut(j)(i)
            x * x
          }.sum
          Scored(i, sentences(i), score)
        }
    }

  /** Steinberger-Ježek "enhanced length" scores, preserved alongside the
    * cross method: sqrt(Σ σ²v²) over surviving concepts, no cell zeroing.
    */
  def scoreSentencesSteinberger(sentences: Seq[String], topics: Int = 15,
      topicSigmaThreshold: Double = 0.75): Seq[Scored] =
    decompose(sentences, topics) match {
      case None => zeroed(sentences)
      case Some((sigma, v)) =>
        val k = sigma.length
        val sMax = if (k > 0) sigma.max else 0.0
        val keep = (0 until k).filter(j => sigma(j) >= topicSigmaThreshold * sMax)
        sentences.indices.map { i =>
          val score = math.sqrt(keep.map { j =>
            val x = sigma(j) * v(j)(i)
            x * x
          }.sum)
          Scored(i, sentences(i), score)
        }
    }

  /** Select the summary: top sentences by cross-method score, returned in
    * original document order (pytldr behavior).
    */
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
