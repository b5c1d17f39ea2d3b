package graft.text

/** Porter stemming algorithm (M.F. Porter, 1980 — public algorithm),
  * used to reproduce the reference's `rouge_scorer(..., use_stemmer=True)`
  * behavior (BigdataProjectCode.py:184). rouge-score delegates to NLTK's
  * PorterStemmer; NLTK applies a few "NLTK_EXTENSIONS" tweaks on top of
  * the 1980 paper — we implement the paper's rules (ORIGINAL_ALGORITHM
  * mode), which agrees with NLTK on the overwhelming majority of English
  * words; divergences are confined to a handful of special-cased words.
  */
object PorterStemmer {

  private def isConsonant(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(w, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isConsonant(w, i)) i += 1
    while (i < n) {
      while (i < n && !isConsonant(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && isConsonant(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(i => !isConsonant(w, i))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 &&
      isConsonant(w, w.length - 3) && !isConsonant(w, w.length - 2) &&
      isConsonant(w, w.length - 1) &&
      !Seq('w', 'x', 'y').contains(w.charAt(w.length - 1))

  /** Replace suffix if condition on the remaining stem holds. */
  private def rule(w: String, suf: String, rep: String, cond: String => Boolean): Option[String] =
    if (w.endsWith(suf)) {
      val stem = w.dropRight(suf.length)
      if (cond(stem)) Some(stem + rep) else None
    } else None

  private def firstRule(w: String, rules: Seq[(String, String, String => Boolean)]): String =
    rules.view.flatMap { case (s, r, c) =>
      if (w.endsWith(s)) Some(rule(w, s, r, c).getOrElse(w)) else None
    }.headOption.getOrElse(w)

  private val always: String => Boolean = _ => true
  private def mGt(k: Int): String => Boolean = s => measure(s) > k

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word.toLowerCase

    // Step 1a
    w = firstRule(w, Seq(
      ("sses", "ss", always), ("ies", "i", always),
      ("ss", "ss", always), ("s", "", always)))

    // Step 1b
    var changed1b = false
    rule(w, "eed", "ee", mGt(0)) match {
      case Some(x) => w = x
      case None if w.endsWith("eed") => // condition failed: leave as-is
      case None =>
        val ed = rule(w, "ed", "", containsVowel)
        val ing = if (ed.isEmpty) rule(w, "ing", "", containsVowel) else None
        (ed orElse ing) match {
          case Some(x) => w = x; changed1b = true
          case None =>
        }
    }
    if (changed1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleConsonant(w) &&
        !Seq('l', 's', 'z').contains(w.charAt(w.length - 1))) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w += "e"
    }

    // Step 1c
    rule(w, "y", "i", containsVowel).foreach(x => w = x)

    // Step 2
    w = firstRule(w, Seq(
      ("ational", "ate", mGt(0)), ("tional", "tion", mGt(0)),
      ("enci", "ence", mGt(0)), ("anci", "ance", mGt(0)),
      ("izer", "ize", mGt(0)), ("abli", "able", mGt(0)),
      ("alli", "al", mGt(0)), ("entli", "ent", mGt(0)),
      ("eli", "e", mGt(0)), ("ousli", "ous", mGt(0)),
      ("ization", "ize", mGt(0)), ("ation", "ate", mGt(0)),
      ("ator", "ate", mGt(0)), ("alism", "al", mGt(0)),
      ("iveness", "ive", mGt(0)), ("fulness", "ful", mGt(0)),
      ("ousness", "ous", mGt(0)), ("aliti", "al", mGt(0)),
      ("iviti", "ive", mGt(0)), ("biliti", "ble", mGt(0))))

    // Step 3
    w = firstRule(w, Seq(
      ("icate", "ic", mGt(0)), ("ative", "", mGt(0)),
      ("alize", "al", mGt(0)), ("iciti", "ic", mGt(0)),
      ("ical", "ic", mGt(0)), ("ful", "", mGt(0)),
      ("ness", "", mGt(0))))

    // Step 4
    val step4Sufs = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
      "ous", "ive", "ize").sortBy(-_.length)
    step4Sufs.find(w.endsWith) match {
      case Some("ion") =>
        val stem = w.dropRight(3)
        if (measure(stem) > 1 && stem.nonEmpty &&
          (stem.endsWith("s") || stem.endsWith("t"))) w = stem
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > 1) w = stem
      case None =>
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l"))
      w = w.dropRight(1)

    w
  }

  def stemAll(words: Seq[String]): Seq[String] = words.map(stem)
}
