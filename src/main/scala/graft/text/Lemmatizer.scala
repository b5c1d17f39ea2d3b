package graft.text

import scala.io.Source

/** Noun lemmatizer approximating NLTK's `WordNetLemmatizer().lemmatize(w)`
  * with the default POS (noun), as used by the reference at
  * BigdataProjectCode.py:51, :68, :362, :366.
  *
  * This is a faithful implementation of WordNet's *morphy* algorithm
  * (public, documented in the WordNet manual; NLTK `wordnet._morphy`)
  * against an embedded ~1.1k-lemma slice of the WordNet noun lexicon:
  *
  *  1. exception list (noun.exc): candidates = form + its exception
  *     lemmas, filtered by the lexicon, SHORTEST wins (ties: first) —
  *     exactly `WordNetLemmatizer.lemmatize`'s `min(lemmas, key=len)`,
  *     which is why "data"→"data" (both forms are lemmas, tie keeps the
  *     original) while "bases"→"basis";
  *  2. otherwise the noun detachment substitutions are applied as
  *     CANDIDATE GENERATION (all matching suffixes, NLTK order
  *     `s→"", ses→s, ves→f, xes→x, zes→z, ches→ch, shes→sh, men→man,
  *     ies→y`), the original form plus candidates filtered by the
  *     lexicon, shortest wins — so "movies"→"movie" (not "movy") and
  *     "specimen"→"specimen" (the original form is a lemma);
  *  3. if nothing is known, rules re-apply to the candidates (morphy
  *     step 3);
  *  4. if the lexicon never resolves (out-of-vocabulary word), a guarded
  *     heuristic strip runs instead — NLTK would return the word
  *     unchanged here, but with only a 1.1k-word lexicon slice (the full
  *     WordNet has ~117k noun lemmas) an unconditional identity would
  *     under-lemmatize common regular plurals; the heuristic is the
  *     better OOV approximation and is the documented divergence bound
  *     (SURVEY.md hard part H1).
  *
  * `TextSpec` pins fidelity against `morphy_expected.tsv` (~2.1k
  * frequent noun forms with their NLTK-expected lemmas).
  */
object Lemmatizer {

  private def resourceLines(path: String): Seq[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
      .filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Embedded slice of the WordNet noun lemma set. */
  private val lexicon: Set[String] =
    resourceLines("/graft/morphy_lexicon.txt").toSet

  /** noun.exc-style exception entries: form -> candidate lemmas in file
    * order (a form can map to several, e.g. "axes" -> ax, axis).
    */
  private val exceptions: Map[String, Seq[String]] =
    resourceLines("/graft/morphy_exceptions.tsv").map { line =>
      val Array(form, cands) = line.split("\t", 2)
      form -> cands.split(" ").toSeq
    }.toMap

  /** NLTK MORPHOLOGICAL_SUBSTITUTIONS[NOUN], in order. */
  private val substitutions: Seq[(String, String)] = Seq(
    "s" -> "", "ses" -> "s", "ves" -> "f", "xes" -> "x", "zes" -> "z",
    "ches" -> "ch", "shes" -> "sh", "men" -> "man", "ies" -> "y")

  /** OOV fallback: ordered first-match detachment with over-stripping
    * guards (round-1 behavior, kept stable for the lemma token streams).
    */
  private val fallbackRules: Seq[(String, String)] = Seq(
    "ches" -> "ch", "shes" -> "sh", "ses" -> "s", "xes" -> "x",
    "zes" -> "z", "ies" -> "y", "men" -> "man", "s" -> "")

  private def applyRules(forms: Seq[String]): Seq[String] =
    for {
      f <- forms
      (old, rep) <- substitutions
      if f.endsWith(old)
    } yield f.dropRight(old.length) + rep

  /** Shortest known candidate, ties to the earliest (Python
    * `min(key=len)` stability).
    */
  private def pick(candidates: Seq[String]): Option[String] = {
    val known = candidates.distinct.filter(lexicon.contains)
    if (known.isEmpty) None else Some(known.minBy(_.length))
  }

  private def fallback(word: String): String =
    fallbackRules.collectFirst {
      case (suf, rep)
          if word.endsWith(suf) &&
            word.length - suf.length + rep.length >= 2 &&
            // leave "-ss" words (class, less) and "-us"/"-is" latinates
            !(suf == "s" && (word.endsWith("ss") || word.endsWith("us") ||
              word.endsWith("is"))) =>
        word.dropRight(suf.length) + rep
    }.getOrElse(word)

  /** Per-executor memo table. morphy is deterministic and token streams
    * repeat the same forms constantly (Zipf), so caching by surface form
    * turns the per-OCCURRENCE cost into a per-DISTINCT-FORM cost. The
    * size cap bounds executor memory against adversarial vocabularies
    * (100 TB of unique junk tokens); past the cap the uncached path
    * still computes correctly.
    */
  private val cacheLimit = 1 << 20
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String](1 << 12)

  def lemma(word: String): String = {
    if (word == null || word.length < 3) return word
    val hit = cache.get(word)
    if (hit != null) return hit
    val out = compute(word)
    if (cache.size < cacheLimit) cache.put(word, out)
    out
  }

  private def compute(word: String): String = {
    exceptions.get(word) match {
      case Some(cands) =>
        pick(word +: cands).getOrElse(cands.head)
      case None =>
        val first = applyRules(Seq(word))
        pick(word +: first).getOrElse {
          // morphy step 3: re-apply rules to the candidates
          var forms = first
          var out: Option[String] = None
          var depth = 0
          while (out.isEmpty && forms.nonEmpty && depth < 6) {
            forms = applyRules(forms)
            out = pick(forms)
            depth += 1
          }
          out.getOrElse(fallback(word))
        }
    }
  }


  def lemmaAll(words: Seq[String]): Seq[String] = words.map(lemma)

  /** Lexicon/exception data for embedding into oracle SQL (the t07 gate
    * query re-implements morphy in DuckDB against the same public data).
    */
  private[graft] def lexiconEntries: Seq[String] = lexicon.toSeq.sorted
  private[graft] def exceptionEntries: Seq[(String, Seq[String])] =
    exceptions.toSeq.sortBy(_._1)
}
