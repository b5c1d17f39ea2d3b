package graft.queries

/** The Porter stemmer (1980 paper rules, exactly as implemented by
  * `graft.text.PorterStemmer`) re-generated as DuckDB SQL, for the rg04
  * stemmed-ROUGE oracle.
  *
  * Core device: a word's consonant/vowel pattern is computed by a
  * `list_reduce` fold over its characters ('y' flips on the previous
  * class, exactly Porter's recursive definition), and the measure m is
  * the count of 'VC' occurrences in the run-collapsed pattern. Every
  * rule condition (m>k, *v*, *d, *o) expands to an inline expression on
  * the candidate stem; each algorithm step is one CTE. ~28 KB of
  * generated SQL — bulky but mechanical, and validated token-for-token
  * against an independent mirror on a 2.2k-word vocabulary (0
  * divergences, incl. all 60 paper examples).
  *
  * `ctes(source)` emits CTEs `p0..p8, stems(tok, stm)` stemming every
  * word of `source(tok)`.
  */
private[queries] object PorterSql {

  private def cv(e: String): String =
    s"list_reduce(list_prepend('', list_transform(range(len($e)), " +
      s"pp -> $e[pp+1])), (acc, ch) -> acc || " +
      "CASE WHEN ch IN ('a','e','i','o','u') THEN 'V' " +
      "WHEN ch = 'y' THEN (CASE WHEN acc = '' THEN 'C' " +
      "WHEN acc[-1] = 'C' THEN 'V' ELSE 'C' END) ELSE 'C' END)"

  private def m(e: String): String =
    s"len(regexp_extract_all(regexp_replace(regexp_replace(${cv(e)}," +
      "'V+','V','g'),'C+','C','g'),'VC'))"

  private def hasv(e: String): String = s"(${cv(e)} LIKE '%V%')"

  private def dbl(e: String): String =
    s"(len($e) >= 2 AND $e[-1] = $e[-2] AND (${cv(e)})[-1] = 'C')"

  private def cvc(e: String): String =
    s"(len($e) >= 3 AND substr(${cv(e)}, len($e)-2, 3) = 'CVC' " +
      s"AND $e[-1] NOT IN ('w','x','y'))"

  private def st(e: String, k: Int): String = s"substr($e, 1, len($e)-$k)"

  private def mgt(k: Int): String => String = s => s"${m(s)} > $k"

  /** firstRule semantics: the FIRST matching suffix decides; if its
    * condition fails the word passes through unchanged (no later suffix
    * is tried) — hence one CASE in rule order.
    */
  private def firstRule(e: String,
      rules: Seq[(String, String, Option[String => String])]): String = {
    val whens = rules.map { case (suf, rep, cond) =>
      val stemE = st(e, suf.length)
      val out = if (rep.nonEmpty) s"$stemE || '$rep'" else stemE
      cond match {
        case None => s"WHEN ends_with($e, '$suf') THEN $out"
        case Some(c) =>
          s"WHEN ends_with($e, '$suf') THEN " +
            s"(CASE WHEN ${c(stemE)} THEN $out ELSE $e END)"
      }
    }
    "CASE " + whens.mkString("\n ") + s" ELSE $e END"
  }

  def ctes(source: String): String = {
    val s1a = firstRule("w0", Seq(
      ("sses", "ss", None), ("ies", "i", None),
      ("ss", "ss", None), ("s", "", None)))

    val e1 = "w1"
    val eedStem = st(e1, 3)
    val edStem = st(e1, 2)
    val ingStem = st(e1, 3)
    val w2 =
      s"CASE WHEN ends_with($e1, 'eed') THEN " +
        s"(CASE WHEN ${mgt(0)(eedStem)} THEN $eedStem || 'ee' ELSE $e1 END) " +
        s"WHEN ends_with($e1, 'ed') AND ${hasv(edStem)} THEN $edStem " +
        s"WHEN ends_with($e1, 'ing') AND ${hasv(ingStem)} THEN $ingStem " +
        s"ELSE $e1 END"
    val chg =
      s"(NOT ends_with($e1, 'eed') AND " +
        s"((ends_with($e1, 'ed') AND ${hasv(edStem)}) OR " +
        s"(ends_with($e1, 'ing') AND ${hasv(ingStem)})))"

    val e2 = "w2"
    val w3 =
      s"CASE WHEN chg THEN (" +
        s"CASE WHEN ends_with($e2,'at') OR ends_with($e2,'bl') OR ends_with($e2,'iz') THEN $e2 || 'e' " +
        s"WHEN ${dbl(e2)} AND $e2[-1] NOT IN ('l','s','z') THEN substr($e2,1,len($e2)-1) " +
        s"WHEN ${m(e2)} = 1 AND ${cvc(e2)} THEN $e2 || 'e' " +
        s"ELSE $e2 END) ELSE $e2 END"

    val e3 = "w3"
    val yStem = st(e3, 1)
    val w4 =
      s"CASE WHEN ends_with($e3, 'y') AND ${hasv(yStem)} " +
        s"THEN $yStem || 'i' ELSE $e3 END"

    val w5 = firstRule("w4", Seq(
      ("ational", "ate", Some(mgt(0))), ("tional", "tion", Some(mgt(0))),
      ("enci", "ence", Some(mgt(0))), ("anci", "ance", Some(mgt(0))),
      ("izer", "ize", Some(mgt(0))), ("abli", "able", Some(mgt(0))),
      ("alli", "al", Some(mgt(0))), ("entli", "ent", Some(mgt(0))),
      ("eli", "e", Some(mgt(0))), ("ousli", "ous", Some(mgt(0))),
      ("ization", "ize", Some(mgt(0))), ("ation", "ate", Some(mgt(0))),
      ("ator", "ate", Some(mgt(0))), ("alism", "al", Some(mgt(0))),
      ("iveness", "ive", Some(mgt(0))), ("fulness", "ful", Some(mgt(0))),
      ("ousness", "ous", Some(mgt(0))), ("aliti", "al", Some(mgt(0))),
      ("iviti", "ive", Some(mgt(0))), ("biliti", "ble", Some(mgt(0)))))

    val w6 = firstRule("w5", Seq(
      ("icate", "ic", Some(mgt(0))), ("ative", "", Some(mgt(0))),
      ("alize", "al", Some(mgt(0))), ("iciti", "ic", Some(mgt(0))),
      ("ical", "ic", Some(mgt(0))), ("ful", "", Some(mgt(0))),
      ("ness", "", Some(mgt(0)))))

    // step 4: longest suffix first (stable within a length), ion special
    val s4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize").sortBy(-_.length)
    val e6 = "w6"
    val w7 = "CASE " + s4.map { suf =>
      val stemE = st(e6, suf.length)
      val cond =
        if (suf == "ion")
          s"${m(stemE)} > 1 AND len($stemE) > 0 AND " +
            s"(ends_with($stemE,'s') OR ends_with($stemE,'t'))"
        else s"${m(stemE)} > 1"
      s"WHEN ends_with($e6, '$suf') THEN " +
        s"(CASE WHEN $cond THEN $stemE ELSE $e6 END)"
    }.mkString("\n ") + s" ELSE $e6 END"

    val e7 = "w7"
    val eStem = st(e7, 1)
    val w8 =
      s"CASE WHEN ends_with($e7, 'e') AND (${m(eStem)} > 1 OR " +
        s"(${m(eStem)} = 1 AND NOT ${cvc(eStem)})) THEN $eStem ELSE $e7 END"

    val e8 = "w8"
    val w9 =
      s"CASE WHEN ${m(e8)} > 1 AND ${dbl(e8)} AND ends_with($e8, 'l') " +
        s"THEN substr($e8,1,len($e8)-1) ELSE $e8 END"

    s"""p0 AS (SELECT tok, lower(tok) AS w0 FROM $source),
       |p1 AS (SELECT tok, w0, $s1a AS w1 FROM p0),
       |p2 AS (SELECT tok, w1, $w2 AS w2, $chg AS chg FROM p1),
       |p3 AS (SELECT tok, $w3 AS w3 FROM p2),
       |p4 AS (SELECT tok, $w4 AS w4 FROM p3),
       |p5 AS (SELECT tok, $w5 AS w5 FROM p4),
       |p6 AS (SELECT tok, $w6 AS w6 FROM p5),
       |p7 AS (SELECT tok, $w7 AS w7 FROM p6),
       |p8 AS (SELECT tok, $w8 AS w8 FROM p7),
       |stems AS (SELECT tok, CASE WHEN len(tok) <= 2 THEN tok ELSE $w9 END AS stm FROM p8)""".stripMargin
  }
}
