package graft.queries

import graft.operators.{TextAnalysis => TA}
import graft.text.StopWords

/** Shared DuckDB fragments for the lang-ID and quality-score oracles —
  * ONE definition for SQL that must stay in lockstep with
  * `TextAnalysis.languageId` / `TextAnalysis.qualityScore` (previously
  * hand-copied per query; a lexicon or weight change then had to be
  * synced across files or the oracles silently diverged).
  *
  * Conventions the composing queries follow:
  *  - `tk`  = `regexp_split_to_array(lower(text), '[^a-zA-Z]+')`
  *  - `tok` = `regexp_extract_all(lower(text), '[a-zA-Z]+')`
  *  - [[voteItems]] emits ven/vfr/ves/vde from `tk`;
  *    [[guessedCase]] consumes them plus `text` (Han probe);
  *  - [[ratioItems]] emits pr/dr/sr from `text` + `tok`;
  *    [[qualityExpr]] consumes them plus a token-count expression.
  */
private[queries] object TextSql {

  val stopSql: String =
    StopWords.nltkEnglishAlpha.map(w => s"'$w'").mkString("[", ",", "]")

  /** `x IN ('w1','w2',…)` — constant-set membership as a hash probe.
    * DuckDB executes `list_contains(constantList, x)` as a LINEAR scan
    * of the list per probed element (measured 44× slower than IN on
    * the 127-word stopword list over the sf0.1 corpus — it was the
    * single biggest line item in the full-gate DuckDB wall); IN over
    * constants compiles to a hash-set lookup. Value-identical for
    * non-null `x` — every caller probes regexp-extracted tokens,
    * which are never null.
    */
  def inWords(words: Seq[String], x: String): String =
    words.map(w => s"'$w'").mkString(s"$x IN (", ",", ")")

  /** Per-language function-word vote counts over the `tk` array. */
  val voteItems: String =
    s"""len(list_filter(tk, x -> ${inWords(TA.lexicons("en"), "x")})) AS ven,
       |  len(list_filter(tk, x -> ${inWords(TA.lexicons("fr"), "x")})) AS vfr,
       |  len(list_filter(tk, x -> ${inWords(TA.lexicons("es"), "x")})) AS ves,
       |  len(list_filter(tk, x -> ${inWords(TA.lexicons("de"), "x")})) AS vde""".stripMargin

  /** Best-vote language with the engine's tie order (en,fr,es,de), Han
    * short-circuit, 'und' when every vote is zero.
    */
  val guessedCase: String =
    """CASE WHEN len(regexp_replace(text, '[^\p{Han}]', '', 'g')) > 0 THEN 'zh'
      |  WHEN ven = greatest(ven, vfr, ves, vde) AND ven > 0 THEN 'en'
      |  WHEN vfr = greatest(ven, vfr, ves, vde) AND vfr > 0 THEN 'fr'
      |  WHEN ves = greatest(ven, vfr, ves, vde) AND ves > 0 THEN 'es'
      |  WHEN vde = greatest(ven, vfr, ves, vde) AND vde > 0 THEN 'de'
      |  ELSE 'und' END""".stripMargin

  /** punct/digit/stopword ratios from `text` + `tok`. */
  val ratioItems: String =
    s"""len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / greatest(length(text), 1) AS pr,
       |  len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1) AS dr,
       |  len(list_filter(tok, x -> ${inWords(StopWords.nltkEnglishAlpha, "x")})) * 1.0 / greatest(len(tok), 1) AS sr""".stripMargin

  /** The composite quality score over pr/dr/sr + a token-count expr,
    * rounded to the 6dp the engine emits.
    */
  def qualityExpr(ntok: String = "ntok"): String =
    s"""round(least($ntok / 64.0, 1.0) * 0.3
       |    + (1.0 - least(pr * 4.0, 1.0)) * 0.25
       |    + (1.0 - least(dr * 4.0, 1.0)) * 0.2
       |    + (1.0 - abs(sr - 0.4)) * 0.25, 6)""".stripMargin
}
