package graft.text

/** Noun lemmatizer approximating NLTK's `WordNetLemmatizer().lemmatize(w)`
  * with the default POS (noun), as used by the reference at
  * BigdataProjectCode.py:51, :68, :362, :366.
  *
  * WordNet's *morphy* algorithm (public, documented in the WordNet manual)
  * is: look the word up in the noun exception list; otherwise apply the
  * noun detachment rules `s→"", ses→s, xes→x, zes→z, ches→ch, shes→sh,
  * men→man, ies→y` and accept a candidate found in the lexicon. We do not
  * ship the WordNet lexicon (offline build), so this implementation applies
  * the same exception list pattern (common irregulars) + ordered detachment
  * rules with guards that avoid the worst over-stripping (e.g. words ending
  * in "ss" or shorter than 3 chars are left alone — "is", "class" survive).
  * Divergence from NLTK is possible for rare words whose stripped form is
  * not a WordNet noun; documented as SURVEY.md hard part H1.
  */
object Lemmatizer {

  private val exceptions: Map[String, String] = Map(
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "lice" -> "louse", "people" -> "person",
    "oxen" -> "ox", "dice" -> "die", "wives" -> "wife",
    "knives" -> "knife", "lives" -> "life", "leaves" -> "leaf",
    "halves" -> "half", "loaves" -> "loaf", "shelves" -> "shelf",
    "wolves" -> "wolf", "selves" -> "self", "thieves" -> "thief",
    "indices" -> "index", "matrices" -> "matrix",
    "vertices" -> "vertex", "appendices" -> "appendix",
    "criteria" -> "criterion", "phenomena" -> "phenomenon",
    "data" -> "datum", "analyses" -> "analysis", "bases" -> "basis",
    "crises" -> "crisis", "theses" -> "thesis",
    "hypotheses" -> "hypothesis", "axes" -> "axis", "series" -> "series",
    "species" -> "species", "means" -> "means", "fish" -> "fish",
    "sheep" -> "sheep", "deer" -> "deer")

  /** Suffixes that, per the morphy noun detachment rules, map to a
    * replacement; tried longest-first like NLTK's `_morphy`.
    */
  private val rules: Seq[(String, String)] = Seq(
    "ches" -> "ch", "shes" -> "sh", "ses" -> "s", "xes" -> "x",
    "zes" -> "z", "ies" -> "y", "men" -> "man", "s" -> "")

  def lemma(word: String): String = {
    if (word == null || word.length < 3) return word
    exceptions.get(word) match {
      case Some(l) => l
      case None =>
        rules.collectFirst {
          case (suf, rep)
              if word.endsWith(suf) &&
                word.length - suf.length + rep.length >= 2 &&
                // leave "-ss" words (class, less) and "-us"/"-is" latinates
                !(suf == "s" && (word.endsWith("ss") || word.endsWith("us") ||
                  word.endsWith("is"))) =>
            word.dropRight(suf.length) + rep
        }.getOrElse(word)
    }
  }

  def lemmaAll(words: Seq[String]): Seq[String] = words.map(lemma)
}
