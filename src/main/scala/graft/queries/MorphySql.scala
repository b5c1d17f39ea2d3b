package graft.queries

import graft.text.Lemmatizer

/** WordNet-morphy re-implemented in DuckDB SQL, for oracle queries that
  * need the lemmatizer (t07, tr03, ls01/ls05/ls09). Embeds the same
  * public lexicon slice + exception list the Scala `Lemmatizer` loads
  * from resources; the ALGORITHM is implemented independently on the
  * SQL side:
  *
  *  - detachment candidates are generated level by level (`ord` encodes
  *    generation order: parent_ord*16 + rule index) — the bounded
  *    7-level recursion is UNROLLED into chained CTEs `cands1..cands7`
  *    so the whole chain is a plain (non-recursive) WITH prefix that
  *    check_oracle's shared-prefix materializer can CREATE TABLE
  *    per-CTE (a `WITH RECURSIVE` def can't be built standalone);
  *  - a lexicon semi-join keeps known forms;
  *  - the pick is NLTK's: lowest non-empty level bucket (original form
  *    and level-1 candidates share bucket 1), then shortest, then
  *    first-generated;
  *  - exceptions and the OOV fallback strip mirror `Lemmatizer.lemma`.
  *
  * Validated token-for-token against an independent mirror on the full
  * 2.1k-form fidelity fixture plus adversarial inputs (0 divergences);
  * the unrolled form is the same candidate bag (the recursion was
  * depth-capped at `lvl < 7`), so hashes are unchanged.
  */
private[queries] object MorphySql {

  private lazy val lexSql: String =
    Lemmatizer.lexiconEntries.map(w => s"'$w'").mkString("[", ",", "]")

  private lazy val excSql: String =
    Lemmatizer.exceptionEntries.flatMap { case (form, cands) =>
      cands.zipWithIndex.map { case (c, i) => s"('$form','$c',${i + 1})" }
    }.mkString(",")

  /** The 7-level detachment-candidate recursion, unrolled: level 1 from
    * `toks`, levels 2..7 each from the previous (the recursive guard was
    * `lvl < 7`, so generation stops after cands7 exactly as before),
    * then the UNION ALL bag. Same rows, types and `ord` arithmetic as
    * the former `WITH RECURSIVE cands`.
    */
  private lazy val candsCtes: String = {
    val l1 =
      s"""cands1 AS (
         |  SELECT t.tok AS tok, 1 AS lvl, r.r::BIGINT AS ord,
         |    t.tok[1:len(t.tok)-len(r.suf)] || r.rep AS c
         |  FROM toks t JOIN rules r ON ends_with(t.tok, r.suf)
         |  WHERE len(t.tok) >= 3)""".stripMargin
    val rest = (2 to 7).map { i =>
      s"""cands$i AS (
         |  SELECT c.tok, c.lvl + 1 AS lvl, c.ord * 16 + r.r AS ord,
         |    c.c[1:len(c.c)-len(r.suf)] || r.rep AS c
         |  FROM cands${i - 1} c JOIN rules r ON ends_with(c.c, r.suf))""".stripMargin
    }
    val union = (1 to 7).map(i => s"SELECT tok, lvl, ord, c FROM cands$i")
      .mkString("\n  UNION ALL ")
    (Seq(l1) ++ rest :+ s"cands AS (\n  $union)").mkString(",\n")
  }

  /** CTE chain ending in `lem(tok, lemma)` — the morphy mapping for every
    * word in a preceding `toks(tok)` CTE. Plain (non-recursive) WITH
    * defs throughout, with no column-list CTEs, so a byte-identical
    * prefix containing this chain is shareable by check_oracle.
    */
  lazy val ctes: String =
    s"""lex AS MATERIALIZED (SELECT unnest($lexSql) AS w),
       |exc AS (SELECT * FROM (VALUES $excSql) t(form, cand, ord)),
       |rules AS (SELECT * FROM (VALUES
       |  (1,'s',''),(2,'ses','s'),(3,'ves','f'),(4,'xes','x'),(5,'zes','z'),
       |  (6,'ches','ch'),(7,'shes','sh'),(8,'men','man'),(9,'ies','y')) t(r, suf, rep)),
       |$candsCtes,
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

  /** THE canonical opening block for every lemma-bearing oracle: the
    * corpus-wide token universe plus the morphy chain, ending in
    * `lem(tok, lemma)`. Byte-identical across t07/tr03/ls01/ls05/ls09,
    * so check_oracle's shared-prefix node materializes the lemma
    * mapping ONCE per gate instead of five morphy replays.
    *
    * The universe is every lowercase alpha token in `documents` — a
    * superset of what each consumer needs (tr03 band-filters documents,
    * ls01/ls05 keep len>=3 non-stopword tokens). morphy is a pure
    * per-token function and each consumer equi-joins `lem` on its own
    * token stream, so widening the universe is hash-neutral; the cost
    * is vocabulary-shaped (Heaps-bounded) at any corpus size.
    */
  lazy val universeCtes: String =
    s"""toks AS MATERIALIZED (
       |  SELECT DISTINCT unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS tok
       |  FROM documents),
       |$ctes""".stripMargin
}
