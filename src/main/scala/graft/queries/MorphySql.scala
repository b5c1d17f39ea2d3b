package graft.queries

import graft.text.Lemmatizer

/** WordNet-morphy re-implemented in DuckDB SQL, for oracle queries that
  * need the lemmatizer (t07, tr03). Embeds the same public lexicon slice
  * + exception list the Scala `Lemmatizer` loads from resources; the
  * ALGORITHM is implemented independently on the SQL side:
  *
  *  - a recursive CTE generates detachment candidates level by level
  *    (`ord` encodes generation order: parent_ord*16 + rule index);
  *  - a lexicon semi-join keeps known forms;
  *  - the pick is NLTK's: lowest non-empty level bucket (original form
  *    and level-1 candidates share bucket 1), then shortest, then
  *    first-generated;
  *  - exceptions and the OOV fallback strip mirror `Lemmatizer.lemma`.
  *
  * Validated token-for-token against an independent mirror on the full
  * 2.1k-form fidelity fixture plus adversarial inputs (0 divergences).
  */
private[queries] object MorphySql {

  private lazy val lexSql: String =
    Lemmatizer.lexiconEntries.map(w => s"'$w'").mkString("[", ",", "]")

  private lazy val excSql: String =
    Lemmatizer.exceptionEntries.flatMap { case (form, cands) =>
      cands.zipWithIndex.map { case (c, i) => s"('$form','$c',${i + 1})" }
    }.mkString(",")

  /** CTE chain ending in `lem(tok, lemma)` — the morphy mapping for every
    * word in a preceding `toks(tok)` CTE. The full query must open with
    * `WITH RECURSIVE` (the candidate generator recurses).
    */
  lazy val ctes: String =
    s"""lex AS MATERIALIZED (SELECT unnest($lexSql) AS w),
       |exc(form, cand, ord) AS (SELECT * FROM (VALUES $excSql) t(form, cand, ord)),
       |rules(r, suf, rep) AS (SELECT * FROM (VALUES
       |  (1,'s',''),(2,'ses','s'),(3,'ves','f'),(4,'xes','x'),(5,'zes','z'),
       |  (6,'ches','ch'),(7,'shes','sh'),(8,'men','man'),(9,'ies','y')) t(r, suf, rep)),
       |cands(tok, lvl, ord, c) AS (
       |  SELECT t.tok, 1, r.r::BIGINT,
       |    t.tok[1:len(t.tok)-len(r.suf)] || r.rep
       |  FROM toks t JOIN rules r ON ends_with(t.tok, r.suf)
       |  WHERE len(t.tok) >= 3
       |  UNION ALL
       |  SELECT c.tok, c.lvl + 1, c.ord * 16 + r.r,
       |    c.c[1:len(c.c)-len(r.suf)] || r.rep
       |  FROM cands c JOIN rules r ON ends_with(c.c, r.suf)
       |  WHERE c.lvl < 7),
       |known AS MATERIALIZED (
       |  SELECT t.tok, 1 AS bucket, 0::BIGINT AS lvl, 0::BIGINT AS ord,
       |    t.tok AS c, len(t.tok) AS l
       |  FROM toks t JOIN lex ON lex.w = t.tok WHERE len(t.tok) >= 3
       |  UNION ALL
       |  SELECT c.tok, greatest(c.lvl, 1), c.lvl, c.ord, c.c, len(c.c)
       |  FROM cands c JOIN lex ON lex.w = c.c),
       |pick AS (SELECT tok, c,
       |    row_number() OVER (PARTITION BY tok ORDER BY bucket, l, lvl, ord) AS rn
       |  FROM known),
       |gen AS MATERIALIZED (SELECT tok, c AS lemma FROM pick WHERE rn = 1),
       |exc_known AS MATERIALIZED (
       |  SELECT e.form, e.cand AS c, e.ord, len(e.cand) AS l
       |  FROM exc e JOIN lex ON lex.w = e.cand
       |  UNION ALL
       |  SELECT DISTINCT e.form, e.form, 0, len(e.form)
       |  FROM exc e JOIN lex ON lex.w = e.form),
       |exc_pick AS (SELECT form, c,
       |    row_number() OVER (PARTITION BY form ORDER BY l, ord) AS rn
       |  FROM exc_known),
       |exc_res AS MATERIALIZED (
       |  SELECT e1.form, coalesce(p.c, e1.cand) AS lemma
       |  FROM (SELECT form, cand FROM exc WHERE ord = 1) e1
       |  LEFT JOIN (SELECT form, c FROM exc_pick WHERE rn = 1) p USING (form)),
       |lem AS MATERIALIZED (
       |  SELECT t.tok,
       |    CASE WHEN len(t.tok) < 3 THEN t.tok
       |      WHEN er.lemma IS NOT NULL THEN er.lemma
       |      WHEN g.lemma IS NOT NULL THEN g.lemma
       |      WHEN ends_with(t.tok,'ches') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-4] || 'ch'
       |      WHEN ends_with(t.tok,'shes') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-4] || 'sh'
       |      WHEN ends_with(t.tok,'ses') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-3] || 's'
       |      WHEN ends_with(t.tok,'xes') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-3] || 'x'
       |      WHEN ends_with(t.tok,'zes') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-3] || 'z'
       |      WHEN ends_with(t.tok,'ies') AND len(t.tok) >= 4 THEN t.tok[1:len(t.tok)-3] || 'y'
       |      WHEN ends_with(t.tok,'men') THEN t.tok[1:len(t.tok)-3] || 'man'
       |      WHEN ends_with(t.tok,'s') AND NOT ends_with(t.tok,'ss')
       |        AND NOT ends_with(t.tok,'us') AND NOT ends_with(t.tok,'is')
       |        THEN t.tok[1:len(t.tok)-1]
       |      ELSE t.tok END AS lemma
       |  FROM toks t
       |  LEFT JOIN exc_res er ON er.form = t.tok
       |  LEFT JOIN gen g ON g.tok = t.tok)""".stripMargin
}
