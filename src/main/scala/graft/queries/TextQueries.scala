package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis => TA}
import graft.tables.Tables
import graft.text.{StopWords, TextFunctions => TF}
import graft.tfidf.TfIdf

/** Token-pipeline + TF-IDF coverage over the `documents` table
  * (SURVEY.md §2.2 P3-P4, §2.3 F3-F5, §2.5 A1-A4, §2.11).
  *
  * Every query here uses only codegen'd Catalyst functions (regexp,
  * higher-order array functions, hash aggregation) so the same plan
  * scales from 500 docs to 100 TB: tokenization is a narrow map, TF/DF
  * are two-level hash aggregations with map-side partial combine, and the
  * IDF join broadcasts the (tiny, sublinear) vocabulary table.
  *
  * Lemmatization (a UDF, SURVEY H1) is kept out of t01-t05 so those
  * pipelines stay pure built-ins; it gets its own gate query (t07) whose
  * oracle re-implements morphy in SQL ([[MorphySql]]).
  */
object TextQueries extends QueryProvider {

  /** NLTK stopword list inlined for oracle SQL (alpha-only subset — the
    * `[a-zA-Z]+` tokenizer can never produce the apostrophe entries).
    */
  private[queries] val stopSql: String =
    StopWords.nltkEnglishAlpha.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB expression for the LSA-style kept-token list (shared with
    * ls06's power-iteration oracle).
    */
  private[queries] def tokSql(src: String = "text"): String =
    s"list_filter(regexp_extract_all(lower($src),'[a-zA-Z]+'), x -> len(x)>=3 AND NOT (${TextSql.inWords(StopWords.nltkEnglishAlpha, "x")}))"

  override val all: Seq[Q] = Seq(

    Q(
      "t01_doc_stats",
      (s, dir) => {
        import s.implicits._
        // fanOut: four regex token pipelines per row off a one-row-group
        // scan would otherwise run on a single core (see graft.Par).
        graft.Par.fanOut(Tables.documents(s, dir))
          .select(
            $"doc_id", $"lang", $"source", $"n_chars",
            length($"text").cast("long").as("text_len"),
            TF.spaceWordCount($"text").cast("long").as("n_ws_words"),
            size(TF.tokenize($"text")).cast("long").as("n_raw_tokens"),
            size(TF.lsaTokens($"text", lemma = false)).cast("long").as("n_kept_tokens"),
            size(array_distinct(TF.lsaTokens($"text", lemma = false))).cast("long").as("n_distinct_tokens"))
          .orderBy($"doc_id")
      },
      Some(s"""SELECT doc_id, lang, source, n_chars,
              |CAST(length(text) AS BIGINT) AS text_len,
              |CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws_words,
              |CAST(len(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS BIGINT) AS n_raw_tokens,
              |CAST(len(${tokSql()}) AS BIGINT) AS n_kept_tokens,
              |CAST(len(list_distinct(${tokSql()})) AS BIGINT) AS n_distinct_tokens
              |FROM documents ORDER BY doc_id""".stripMargin),
      bench = true),

    Q(
      "t02_term_counts",
      (s, dir) => {
        import s.implicits._
        val tok = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        TfIdf.termFrequencies(tok, "doc_id", "tokens")
          .groupBy($"token")
          .agg(sum($"tf").as("total_tf"), count(lit(1)).as("n_docs"))
          .orderBy(desc("total_tf"), $"token")
          .limit(50)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${tokSql()}) AS token FROM documents)
              |SELECT token, count(*) AS total_tf, count(DISTINCT doc_id) AS n_docs
              |FROM tok GROUP BY token ORDER BY total_tf DESC, token LIMIT 50""".stripMargin),
      bench = true),

    Q(
      "t03_tf_pairs",
      (s, dir) => {
        import s.implicits._
        val tok = Tables.documents(s, dir).filter($"doc_id" < 10)
          .select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        TfIdf.termFrequencies(tok, "doc_id", "tokens")
          .orderBy($"doc_id", $"token")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${tokSql()}) AS token
              |FROM documents WHERE doc_id < 10)
              |SELECT doc_id, token, count(*) AS tf FROM tok
              |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin)),

    Q(
      "t04_df_idf",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val n = docs.count()
        val tok = docs.select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        val tf = TfIdf.termFrequencies(tok, "doc_id", "tokens")
        TfIdf.idfTable(tf, "doc_id", n)
          .select($"token", $"df", round($"idf", 6).as("idf"))
          .orderBy(desc("df"), $"token")
          .limit(100)
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${tokSql()}) AS token FROM documents),
              |d AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token)
              |SELECT token, df,
              |round(log10((SELECT count(*) FROM documents) * 1.0 / df), 6) AS idf
              |FROM d ORDER BY df DESC, token LIMIT 100""".stripMargin)),

    Q(
      "t05_tfidf",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val n = docs.count()
        val tok = docs.select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        TfIdf.tfidf(tok, "doc_id", "tokens", n)
          .filter($"doc_id" < 5)
          .select($"doc_id", $"token", $"tf", $"df",
            round($"tfidf", 6).as("tfidf"))
          .orderBy($"doc_id", $"token")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${tokSql()}) AS token FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
              |d AS (SELECT token, count(*) AS df FROM tf GROUP BY token)
              |SELECT tf.doc_id, tf.token, tf.tf, d.df,
              |round(tf.tf * log10((SELECT count(*) FROM documents) * 1.0 / d.df), 6) AS tfidf
              |FROM tf JOIN d USING (token) WHERE tf.doc_id < 5
              |ORDER BY doc_id, token""".stripMargin)),

    // Per-language aggregate over declared metadata (slice for lang-ID
    // comparisons; the heuristic language guesser itself is rows-only).
    Q(
      "t06_lang_profile",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg($"n_chars"), 4).as("avg_chars"),
            round(avg(size(TF.tokenize($"text"))), 4).as("avg_tokens"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars),4) AS avg_chars,
             |round(avg(len(regexp_extract_all(lower(text),'[a-zA-Z]+'))),4) AS avg_tokens
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // The lemmatizer itself (SURVEY H1), oracle-checked on the corpus
    // vocabulary: DuckDB re-implements morphy from the same public data —
    // a recursive CTE generates detachment candidates level by level
    // (ord encodes generation order), a lexicon semi-join keeps known
    // forms, and the pick is NLTK's: lowest non-empty level bucket, then
    // shortest, then first-generated; exceptions and the OOV fallback
    // strip mirror Lemmatizer.lemma exactly.
    Q(
      "t07_lemma_vocab",
      (s, dir) => {
        import s.implicits._
        val lem = udf((w: String) => graft.text.Lemmatizer.lemma(w))
        Tables.documents(s, dir)
          .select(explode(TF.tokenize($"text")).as("tok"))
          .distinct()
          .select($"tok", lem($"tok").as("lemma"))
          .orderBy($"tok")
      },
      Some(
        s"""WITH
           |${MorphySql.universeCtes}
           |SELECT tok, lemma FROM lem ORDER BY tok""".stripMargin)),

    // Adjacent-token bigram counts (n-gram language statistics — the
    // building block of n-gram LMs and contamination checks). The
    // bigram list is built row-locally with zip_with over two slices
    // (no self-join, no posexplode shuffle); the only shuffle is the
    // final count hash-aggregate with map-side combine. cnt >= 5 bounds
    // the output to the interesting head.
    Q(
      "t08_bigram_counts",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
          .select($"doc_id", explode(zip_with(
            slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
            slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
            (a, b) => concat_ws(" ", a, b))).as("bigram"))
          .groupBy($"bigram")
          .agg(count(lit(1)).as("cnt"),
            countDistinct($"doc_id").as("n_docs"))
          .filter($"cnt" >= 5)
          .orderBy(desc("cnt"), $"bigram")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |bg AS (SELECT doc_id, unnest(list_transform(
             |    range(greatest(len(t)-1, 0)), i -> t[i+1] || ' ' || t[i+2])) AS bigram
             |  FROM tok)
             |SELECT bigram, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
             |FROM bg GROUP BY bigram HAVING count(*) >= 5
             |ORDER BY cnt DESC, bigram""".stripMargin)),

    // Inverted index: kept-token term -> document frequency + sorted
    // postings list. One distinct-explode (narrow) + one hash-aggregate
    // on term. Postings are emitted as a canonical comma-joined string
    // (cross-engine-comparable; a production index at 100 TB would
    // delta-encode and shard postings by term range, but the groupBy
    // shape — all postings for a term meet in one place — is the same).
    Q(
      "t09_inverted_index",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            explode(array_distinct(TF.lsaTokens($"text", lemma = false))).as("term"))
          .groupBy($"term")
          .agg(count(lit(1)).as("df"),
            array_join(transform(sort_array(collect_set($"doc_id")),
              _.cast("string")), ",").as("postings"))
          .filter($"df" >= 3)
          .orderBy($"term")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(list_distinct(${tokSql()})) AS term
              |  FROM documents)
              |SELECT term, count(*) AS df,
              |array_to_string(list_sort(list(doc_id)), ',') AS postings
              |FROM tok GROUP BY term HAVING count(*) >= 3
              |ORDER BY term""".stripMargin)),

    // Per-language character-bigram profile (the feature family n-gram
    // language identifiers train on). The text is reduced to lowercase
    // a-z FIRST and the reduced string materialized as a column, so the
    // bigram lambda slices ASCII only (identical character semantics in
    // both engines) and the cleaning regex runs once per row, not once
    // per lambda element. Top-10 per language via a count-ordered
    // window over the (tiny) per-language aggregate.
    Q(
      "t10_char_bigrams",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy(desc("cnt"), $"bigram")
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"lang",
            regexp_replace(lower($"text"), "[^a-z]", "").as("c"))
          // fused sliding-window bigrams: byte-identical to
          // when(length<2, []).otherwise(transform(sequence(1, len-1),
          // i -> substr(c, i, 2))) — see CharNgrams (the HOF form
          // re-scanned the string per position, O(chars²) per doc)
          .select($"lang", org.apache.spark.sql.graft.ColumnBridge.column(
            graft.functions.CharNgrams(
              org.apache.spark.sql.graft.ColumnBridge.expression($"c"), 2))
            .as("bgs"))
          .select($"lang", explode($"bgs").as("bigram"))
          .groupBy($"lang", $"bigram").agg(count(lit(1)).as("cnt"))
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 10)
          .select($"lang", $"rnk", $"bigram", $"cnt")
          .orderBy($"lang", $"rnk")
      },
      Some("""WITH c AS (SELECT lang,
             |  regexp_replace(lower(text), '[^a-z]', '', 'g') AS s FROM documents),
             |bg AS (SELECT lang, unnest(list_transform(range(1, len(s)),
             |    i -> s[i:i+1])) AS bigram FROM c),
             |cnts AS (SELECT lang, bigram, count(*) AS cnt
             |  FROM bg GROUP BY lang, bigram),
             |r AS (SELECT *, row_number() OVER (PARTITION BY lang
             |    ORDER BY cnt DESC, bigram) AS rnk FROM cnts)
             |SELECT lang, CAST(rnk AS INTEGER) AS rnk, bigram, cnt
             |FROM r WHERE rnk <= 10
             |ORDER BY lang, rnk""".stripMargin)),

    // Sentence destructure as a GATE query (SURVEY P2 — previously
    // unit-only): split on '.' with positional ids, exactly the
    // reference's sentence table shape, plus a per-sentence word count.
    // Row-local explode — a narrow 1→many map, no shuffle; the ORDER BY
    // is the gate's determinism requirement, not part of the operator.
    Q(
      "t11_sentences",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .filter($"doc_id" < 100)
          .select($"doc_id",
            posexplode(split($"text", "\\.")).as(Seq("sent_idx", "sentence")))
          .select($"doc_id", $"sent_idx",
            trim($"sentence").as("sentence"),
            TA.wsTokenCount(trim($"sentence")).cast("long").as("ws_tokens"))
          .filter(length($"sentence") > 0)
          .orderBy($"doc_id", $"sent_idx")
      },
      Some("""WITH s AS (SELECT doc_id,
             |  regexp_split_to_array(text, '\.') AS arr
             |  FROM documents WHERE doc_id < 100),
             |e AS (SELECT doc_id,
             |  CAST(unnest(range(1, len(arr)+1)) - 1 AS INTEGER) AS sent_idx,
             |  trim(unnest(arr)) AS sentence FROM s)
             |SELECT doc_id, sent_idx, sentence,
             |CAST(len(regexp_split_to_array(trim(sentence), '\s+')) AS BIGINT) AS ws_tokens
             |FROM e WHERE length(sentence) > 0
             |ORDER BY doc_id, sent_idx""".stripMargin)),

    // Per-document keyword extraction: top-3 tokens by TF-IDF — the
    // doc-level counterpart of LSA's corpus-level concept keywords
    // (tagging, routing, index-time metadata). Ranked on the ROUNDED
    // score so tie-breaks are engine-stable; plans as the
    // WindowGroupLimit top-k shape over the tfidf join (map tasks
    // forward ≤3 rows per doc into the window shuffle).
    Q(
      "t12_doc_keywords",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val n = docs.count()
        val tok = graft.Par.fanOut(docs)
          .select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy(desc("tfidf"), $"token")
        TfIdf.tfidf(tok, "doc_id", "tokens", n)
          .withColumn("tfidf", round($"tfidf", 6))
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .select($"doc_id", $"rnk".cast("long").as("rnk"), $"token", $"tfidf")
          .orderBy($"doc_id", $"rnk")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${tokSql()}) AS token FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
              |d AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
              |x AS (SELECT tf.doc_id, tf.token,
              |  round(tf.tf * log10((SELECT count(*) FROM documents) * 1.0 / d.df), 6) AS tfidf
              |  FROM tf JOIN d USING (token)),
              |r AS (SELECT *, row_number() OVER
              |  (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk FROM x)
              |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, tfidf
              |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin)),

    // BM25 ranked retrieval (Lucene +1 idf form, k1=1.2 b=0.75) for a
    // 3-term query — the scoring consumer of the t09 inverted index.
    // Per-term contributions pivot into COLUMNS and add in fixed term
    // order (an unordered float sum() would not be engine-stable), and
    // the top-50 ships as TakeOrderedAndProject — no global window.
    // The oracle replays tf/df/avgdl and the identical IEEE expression
    // tree: same association, same ln() form, both engines promote the
    // BIGINT tf/df/dl operands to double at the same spots.
    Q(
      "t13_bm25",
      (s, dir) => {
        import s.implicits._
        graft.operators.Bm25.score(
          graft.Par.fanOut(Tables.documents(s, dir)), "doc_id",
          TF.tokenize($"text"), Seq("spark", "join", "window"))
          .orderBy(desc("score"), $"doc_id")
          .limit(50)
      },
      Some(s"""$bm25CtesSql
              |SELECT doc_id, dl, c_spark, c_join, c_window, score
              |FROM bm ORDER BY score DESC, doc_id LIMIT 50""".stripMargin),
      bench = true),

    // Reciprocal Rank Fusion of two retrievers for the same query —
    // BM25 (t13's scorer) and raw query-term frequency. Each ranker is
    // truncated to its top 100 FIRST via orderBy+limit
    // (TakeOrderedAndProject — a distributed top-k, no global sort);
    // the row_number that assigns 1-based ranks then runs over <= 100
    // rows, so the single-partition window is bounded by construction.
    // Ranks are taken on 6dp-ROUNDED scores with doc_id tiebreaks on
    // both sides (playbook pin), and the fused score adds the two
    // rounded 1/(60+rank) terms in fixed ranker order.
    Q(
      "t14_rrf_fusion",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val terms = Seq("spark", "join", "window")
        val bm = graft.operators.Bm25.score(docs, "doc_id",
          TF.tokenize($"text"), terms)
        val r1 = bm.select($"doc_id", $"score")
          .orderBy(desc("score"), $"doc_id").limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("score"), $"doc_id")))
          .select($"doc_id", $"rnk")
        val r2 = docs
          .select($"doc_id", explode(TF.tokenize($"text")).as("tok"))
          .filter($"tok".isin(terms: _*))
          .groupBy($"doc_id").agg(count(lit(1)).as("tftot"))
          .orderBy(desc("tftot"), $"doc_id").limit(100)
          .withColumn("rnk", row_number().over(
            Window.orderBy(desc("tftot"), $"doc_id")))
          .select($"doc_id", $"rnk")
        graft.operators.Rrf.fuse(Seq("bm25" -> r1, "tf" -> r2), k = 60)
          .orderBy(desc("rrf_score"), $"doc_id").limit(30)
      },
      Some(s"""$bm25CtesSql,
              |r1 AS (SELECT doc_id,
              |  row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
              |  FROM bm QUALIFY rnk <= 100),
              |tft AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tftot
              |  FROM tf GROUP BY doc_id),
              |r2 AS (SELECT doc_id,
              |  row_number() OVER (ORDER BY tftot DESC, doc_id) AS rnk
              |  FROM tft QUALIFY rnk <= 100),
              |f AS (SELECT coalesce(r1.doc_id, r2.doc_id) AS doc_id,
              |  round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + r1.rnk), 0.0), 6) AS rrf_bm25,
              |  round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + r2.rnk), 0.0), 6) AS rrf_tf
              |  FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id)
              |SELECT doc_id, rrf_bm25, rrf_tf,
              |round(rrf_bm25 + rrf_tf, 6) AS rrf_score
              |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 30""".stripMargin)),

    // BPE vocabulary induction (Sennrich et al. 2016) — tokenizer
    // training as a pipeline stage: ONE corpus-scale pass reduces the
    // corpus to its word-type frequency table; the 20 merge steps then
    // run over that tiny distributed table, one pair-count hash agg +
    // top-1 argmax each, with only the winning pair row reaching the
    // driver (see operators/Bpe.scala). Ties break by (l, r) ascending
    // on both engines, so the whole merge trajectory is engine-stable;
    // the oracle replays all 20 stages as materialized CTEs with the
    // same greedy left-to-right fold.
    Q(
      "t15_bpe_merges",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select(TF.tokenize($"text").as("tokens"))
        graft.operators.Bpe.merges(s,
          graft.operators.Bpe.wordFrequencies(toks, "tokens"),
          numMerges = 20)
          .orderBy($"step")
      },
      Some(t15OracleSql),
      bench = true),

    // The trained tokenizer applied back to the corpus: subword-token
    // frequencies after t15's 20 merges — the token-counting step of a
    // data budget, with a REAL subword vocabulary instead of the
    // whitespace proxy. Encoding is a pure function of the word TYPE,
    // so the corpus is never re-scanned: the type table's final symbol
    // strings are exploded and re-weighted by type frequency (at scale:
    // encode each distinct word once, broadcast-join the dictionary).
    Q(
      "t16_bpe_encode",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select(TF.tokenize($"text").as("tokens"))
        graft.operators.Bpe.subwordCounts(s,
          graft.operators.Bpe.wordFrequencies(toks, "tokens"),
          numMerges = 20)
          .orderBy(desc("cnt"), $"token").limit(50)
      },
      Some(s"""$bpeCtesSql
              |SELECT token, CAST(sum(freq) AS BIGINT) AS cnt FROM
              |  (SELECT freq, unnest(string_split(repr, chr(31))) AS token FROM r20)
              |GROUP BY token ORDER BY cnt DESC, token LIMIT 50""".stripMargin)),

    // Per-language fertility under the TRAINED tokenizer — the real-
    // subword complement to a23's BPE-ish regex proxy: t15's 20-merge
    // vocabulary is applied back per word TYPE (subwordDict — a
    // vocabulary-sized broadcast dictionary at any corpus scale), and
    // each language reports its mean tokens-per-word in exact-decimal
    // means. This is the number a multilingual mixture design actually
    // budgets with: a language at 2× fertility costs 2× context per
    // word UNDER THE TOKENIZER THAT WILL BE USED, not under a proxy.
    // Oracle: the shared bpeCtesSql chain → dict from r20 → the same
    // per-doc ratio means.
    Q(
      "t20_bpe_fertility",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val dict = graft.operators.Bpe.subwordDict(s,
          graft.operators.Bpe.wordFrequencies(
            docs.select(TF.tokenize($"text").as("tokens")), "tokens"),
          numMerges = 20)
        docs.select($"doc_id", $"lang",
            explode(TF.tokenize($"text")).as("word"))
          .join(broadcast(dict), "word")
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("nw"), sum($"n_sub").cast("long").as("ns"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"nw").cast("long").as("n_words"),
            sum($"ns").cast("long").as("n_subwords"),
            round(sum(($"ns" * 1.0 / $"nw").cast("decimal(38,18)"))
              .cast("double") / count(lit(1)), 6).as("bpe_fertility"))
          .orderBy($"lang")
      },
      Some(s"""$bpeCtesSql,
              |dict AS (SELECT word, len(string_split(repr, chr(31))) AS n_sub
              |  FROM r20),
              |dw AS (SELECT doc_id, lang,
              |  unnest(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS word
              |  FROM documents),
              |pd AS (SELECT doc_id, lang, count(*) AS nw,
              |  CAST(sum(n_sub) AS BIGINT) AS ns
              |  FROM dw JOIN dict USING (word) GROUP BY doc_id, lang)
              |SELECT lang, count(*) AS n_docs,
              |  CAST(sum(nw) AS BIGINT) AS n_words,
              |  CAST(sum(ns) AS BIGINT) AS n_subwords,
              |  round(CAST(sum(CAST(ns * 1.0 / nw AS DECIMAL(38,18))) AS DOUBLE)
              |    / count(*), 6) AS bpe_fertility
              |FROM pd GROUP BY lang ORDER BY lang""".stripMargin)),

    // Keyword-in-context concordance (the corpus-linguistics KWIC
    // view): every occurrence of the query term with its ±2-token
    // window. A row-local Generate + array slices — narrow at any
    // corpus size; the t09 inverted index is the indexed variant when
    // the term set is open-ended.
    Q(
      "t17_kwic",
      (s, dir) => {
        import s.implicits._
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("tokens"))
          .select($"doc_id", $"tokens",
            posexplode($"tokens").as(Seq("p", "token")))
          .filter($"token" === "spark")
          .select($"doc_id", ($"p" + 1).cast("long").as("pos"),
            expr("array_join(slice(tokens, greatest(p - 1, 1), " +
              "(p + 1) - greatest(p - 1, 1)), ' ')").as("left_ctx"),
            expr("array_join(slice(tokens, p + 2, 2), ' ')").as("right_ctx"))
          .orderBy($"doc_id", $"pos")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
             |occ AS (SELECT doc_id, tok, i FROM t,
             |  unnest(range(len(tok))) AS r(i) WHERE tok[i + 1] = 'spark')
             |SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
             |  coalesce(array_to_string(tok[greatest(i - 1, 1) : i], ' '), '')
             |    AS left_ctx,
             |  coalesce(array_to_string(tok[i + 2 : i + 3], ' '), '')
             |    AS right_ctx
             |FROM occ ORDER BY doc_id, pos""".stripMargin)),

    // Collocation extraction — pointwise mutual information over the
    // t08 bigrams: PMI = ln(c(xy)·N / (c(x)·c(y))), every count an
    // integer hash agg, one ln per surviving bigram (≥5 occurrences),
    // ranked by the 6dp-ROUNDED score with bigram tiebreaks (the
    // engine-stable ordering rule). Two token-keyed joins attach the
    // unigram counts — at 100 TB the unigram table shuffles once and
    // co-partitions with both probes.
    Q(
      "t18_collocations",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
        val uni = toks.select(explode($"t").as("token"))
          .groupBy($"token").agg(count(lit(1)).as("cu"))
        val n = uni.agg(sum($"cu").as("n"))
        val bg = toks
          .select(explode(zip_with(
            slice($"t", lit(1), greatest(size($"t") - 1, lit(0))),
            slice($"t", lit(2), greatest(size($"t") - 1, lit(0))),
            (a, b) => concat_ws(" ", a, b))).as("bigram"))
          .groupBy($"bigram").agg(count(lit(1)).as("cnt"))
          .filter($"cnt" >= 5)
          .select($"bigram", $"cnt",
            split($"bigram", " ").getItem(0).as("x"),
            split($"bigram", " ").getItem(1).as("y"))
        bg.join(uni.select($"token".as("x"), $"cu".as("cx")), Seq("x"))
          .join(uni.select($"token".as("y"), $"cu".as("cy")), Seq("y"))
          .crossJoin(broadcast(n))
          .select($"bigram", $"cnt", $"cx", $"cy",
            round(log(($"cnt" * lit(1.0) * $"n") /
              ($"cx" * lit(1.0) * $"cy")), 6).as("pmi"))
          .orderBy(desc("pmi"), $"bigram").limit(50)
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |uni AS (SELECT u AS token, CAST(count(*) AS BIGINT) AS cu FROM
             |  (SELECT unnest(t) AS u FROM tok) GROUP BY u),
             |n AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM uni),
             |bg AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM
             |  (SELECT unnest(list_transform(range(greatest(len(t)-1, 0)),
             |     i -> t[i+1] || ' ' || t[i+2])) AS bigram FROM tok)
             |  GROUP BY bigram HAVING count(*) >= 5),
             |sp AS (SELECT bigram, cnt,
             |  string_split(bigram, ' ')[1] AS x,
             |  string_split(bigram, ' ')[2] AS y FROM bg),
             |j AS (SELECT bigram, cnt, ux.cu AS cx, uy.cu AS cy
             |  FROM sp JOIN uni ux ON ux.token = sp.x
             |    JOIN uni uy ON uy.token = sp.y)
             |SELECT bigram, cnt, cx, cy,
             |  round(ln((cnt * 1.0 * n) / (cx * 1.0 * cy)), 6) AS pmi
             |FROM j CROSS JOIN n
             |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin)),

    // Unicode text normalization — the canonical first pass of a text
    // pipeline: curly quotes/dashes mapped to ASCII (translate),
    // control characters to spaces, whitespace runs collapsed, edges
    // trimmed. Pure narrow codegen'd expressions (translate +
    // regexp_replace), no shuffle before the gate sort — the shape that
    // streams through 100 TB at scan speed.
    Q(
      "t19_normalize",
      (s, dir) => {
        import s.implicits._
        val quotes = "‘’“”–—"
        val norm = trim(regexp_replace(regexp_replace(
          translate($"text", quotes, "''\"\"--"),
          "[\\x00-\\x1f]", " "), "\\s+", " "))
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", norm.as("norm"),
            (norm =!= $"text").as("changed"),
            length(norm).cast("long").as("n_chars"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(
             |    translate(text, '‘’“”–—', '''''""--'),
             |    '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm,
             |  trim(regexp_replace(regexp_replace(
             |    translate(text, '‘’“”–—', '''''""--'),
             |    '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g')) <> text AS changed,
             |  CAST(length(trim(regexp_replace(regexp_replace(
             |    translate(text, '‘’“”–—', '''''""--'),
             |    '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BPE-encode optimality audit (Bpe.optimalityGap): merge-order
    // token count vs the DP-shortest segmentation over the same final
    // vocabulary, on the 50 most frequent word types. The oracle
    // replays the merge chain, then solves the same shortest-
    // segmentation problem INDEPENDENTLY — a breadth-first recursive
    // CTE over (word, position, level) pruned by level <= bpe_ntok
    // (sound: the BPE repr itself is a valid segmentation).
    Q(
      "t21_bpe_optimality",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select(TF.tokenize($"text").as("tokens"))
        graft.operators.Bpe.optimalityGap(s,
          graft.operators.Bpe.wordFrequencies(toks, "tokens"),
          numMerges = 20)
          .orderBy(desc("freq"), $"word").limit(50)
          .orderBy(desc("freq"), $"word")
      },
      Some(s"""WITH RECURSIVE ${bpeCtesSql.stripPrefix("WITH ")},
              |u AS (SELECT DISTINCT unnest(string_split(repr, chr(31))) AS tokn
              |  FROM r20),
              |w AS (SELECT word, freq,
              |    CAST(len(string_split(repr, chr(31))) AS INTEGER) AS bpe_ntok,
              |    word || '$$' AS t
              |  FROM r20 ORDER BY freq DESC, word LIMIT 50),
              |reach AS (
              |  SELECT word, 0 AS pos, 0 AS lvl FROM w
              |  UNION
              |  SELECT r.word, r.pos + length(u.tokn) AS pos, r.lvl + 1 AS lvl
              |  FROM reach r
              |  JOIN w ON w.word = r.word
              |  JOIN u ON substr(w.t, r.pos + 1, length(u.tokn)) = u.tokn
              |  WHERE r.pos < length(w.t) AND r.lvl < w.bpe_ntok
              |),
              |opt AS (SELECT r.word, CAST(min(r.lvl) AS INTEGER) AS opt_ntok
              |  FROM reach r JOIN w ON w.word = r.word
              |  WHERE r.pos = length(w.t) GROUP BY r.word)
              |SELECT w.word, w.freq, w.bpe_ntok, o.opt_ntok,
              |  w.bpe_ntok - o.opt_ntok AS gap
              |FROM w JOIN opt o USING (word)
              |ORDER BY w.freq DESC, w.word""".stripMargin)),

    // Unigram-LM subword tokenizer (Kudo 2018, hard-EM variant; see
    // operators/Unigram.scala): substring-seeded vocabulary ->
    // Viterbi E-step -> usage-count M-step -> final Viterbi. The
    // oracle replays BOTH Viterbi passes as recursive-CTE DPs carrying
    // (best, back) lists per word type, the backpointer walks as a
    // second recursion, and the 6dp-rounded -ln scores — identical
    // left-to-right double additions, first-minimal tie-break, and the
    // same 1e18 missing-piece sentinel as the engine.
    Q(
      "t22_unigram_train",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select(TF.tokenize($"text").as("tokens"))
        graft.operators.Unigram.train(s,
          graft.operators.Bpe.wordFrequencies(toks, "tokens"),
          vocabSize = 64, maxLen = 6)
          .orderBy($"piece")
      },
      Some(unigramOracleSql(64, 6))),

    // Unigram-tokenizer fertility per language — the t20 BPE audit
    // re-run under the t22 model, so the two tokenizers compare
    // head-to-head on identical metrics (pieces per word, per-doc mean
    // fertility). Corpus side is one broadcast dict join; the oracle
    // re-derives the dict from the shared recursive segmentation chain.
    Q(
      "t23_unigram_fertility",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val dict = graft.operators.Unigram.encodeDict(s,
          graft.operators.Bpe.wordFrequencies(
            docs.select(TF.tokenize($"text").as("tokens")), "tokens"),
          vocabSize = 64, maxLen = 6)
        docs.select($"doc_id", $"lang",
            explode(TF.tokenize($"text")).as("word"))
          .join(broadcast(dict), "word")
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("nw"), sum($"n_sub").cast("long").as("ns"))
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"nw").cast("long").as("n_words"),
            sum($"ns").cast("long").as("n_subwords"),
            round(sum(($"ns" * 1.0 / $"nw").cast("decimal(38,18)"))
              .cast("double") / count(lit(1)), 6).as("uni_fertility"))
          .orderBy($"lang")
      },
      Some(unigramFertilityOracleSql)),

    // Posting-list compression audit (t24) — the index-layout decision
    // behind t09: per term, the doc-id d-gaps, the frame-of-reference
    // bitwidth the max gap forces, and the varint byte cost, against
    // the raw 8-byte/id baseline. All integer arithmetic (bitwidths
    // via explicit threshold ladders, not float log2 — engine-exact);
    // gaps are a row-local indexed transform over each term's sorted
    // posting array, one agg shuffle total.
    Q(
      "t24_posting_compression",
      (s, dir) => {
        import s.implicits._
        val lim = 20
        def ladder(c: String): String =
          (1 to lim).map(b => s"WHEN $c < ${1L << b} THEN $b")
            .mkString("CASE ", " ", s" ELSE ${lim + 1} END")
        def vladder(c: String): String =
          (1 to lim).map(b =>
            s"WHEN $c < ${1L << b} THEN CAST(ceil($b / 7.0) AS INT)")
            .mkString("CASE ", " ", s" ELSE ${(lim + 7) / 7 + 1} END")
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            explode(array_distinct(TF.lsaTokens($"text", lemma = false)))
              .as("term"))
          .groupBy($"term")
          .agg(sort_array(collect_set($"doc_id")).as("ids"))
          .filter(size($"ids") >= 3)
          .withColumn("gaps", expr(
            "transform(ids, (x, i) -> IF(i = 0, x + 1, x - element_at(ids, i)))"))
          .select($"term",
            size($"ids").cast("long").as("n_docs"),
            expr("array_max(gaps)").cast("long").as("max_gap"),
            expr(s"${ladder("array_max(gaps)")}").cast("long").as("for_bits"),
            expr(s"aggregate(gaps, 0L, (a, g) -> a + (${vladder("g")}))")
              .as("varint_bytes_raw"))
          .select($"term", $"n_docs", $"max_gap", $"for_bits",
            (($"n_docs" * $"for_bits" + 7) / 8).cast("long").as("for_bytes"),
            $"varint_bytes_raw".cast("long").as("varint_bytes"),
            round($"varint_bytes_raw" * 1.0 / ($"n_docs" * 8), 6)
              .as("ratio_vs_raw"))
          .orderBy($"term")
      },
      Some(t24OracleSql)),

    // Tokenizer diff audit (t25) — where BPE and the unigram model
    // disagree: per word type, both token counts (BPE's end-marker
    // symbol excluded so the comparison is honest) and the delta,
    // restricted to disagreeing words, heaviest first. The table a
    // tokenizer migration reviews before swapping models. Oracle
    // stitches the two already-green chains (BPE's 20 merge stages +
    // the unigram recursive DP) into one statement.
    Q(
      "t25_tokenizer_diff",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select(TF.tokenize($"text").as("tokens"))
        val wf = graft.operators.Bpe.wordFrequencies(toks, "tokens")
          .persist()
        val bd = graft.operators.Bpe.subwordDict(s, wf, numMerges = 20)
          .select($"word", ($"n_sub" - 1).cast("long").as("bpe_ntok"))
        val ud = graft.operators.Unigram.encodeDict(s, wf,
            vocabSize = 64, maxLen = 6)
          .select($"word", $"n_sub".cast("long").as("uni_ntok"))
        wf.join(bd, Seq("word")).join(ud, Seq("word"))
          .filter($"bpe_ntok" =!= $"uni_ntok")
          .select($"word", $"freq", $"bpe_ntok", $"uni_ntok",
            ($"bpe_ntok" - $"uni_ntok").as("delta"))
          .orderBy($"freq".desc, $"word")
      },
      Some(t25OracleSql)),

    // Zipf coverage curve (t26) — cumulative token coverage of the
    // top-k vocabulary at k = 1..32: the vocabulary-budget selection
    // curve (how much of the token stream a k-entry dictionary
    // explains). One vocabulary-sized aggregate + a 6-row broadcast
    // grid; the cumulative sums are integers, engine-exact.
    Q(
      "t26_vocab_coverage",
      (s, dir) => {
        import s.implicits._
        val wf = graft.operators.Bpe.wordFrequencies(
          graft.Par.fanOut(Tables.documents(s, dir))
            .select(TF.tokenize($"text").as("tokens")), "tokens")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"freq".desc, $"word")
        val ranked = wf.withColumn("rn", row_number().over(w))
        val tot = wf.agg(sum($"freq").as("tot"),
          count(lit(1)).as("v"))
        val ks = s.createDataFrame(
            Seq(1, 2, 4, 8, 16, 32).map(Tuple1(_))).toDF("k")
        broadcast(ks).join(ranked, $"rn" <= $"k")
          .crossJoin(broadcast(tot))
          .groupBy($"k", $"v", $"tot")
          .agg(sum($"freq").as("covered"))
          .select($"k", least($"k".cast("long"), $"v").as("vocab_used"),
            $"covered",
            round($"covered" * 1.0 / $"tot", 6).as("coverage"))
          .orderBy($"k")
      },
      Some("""WITH tok AS (SELECT
             |  unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS word
             |  FROM documents),
             |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
             |  FROM tok GROUP BY word),
             |r AS (SELECT word, freq, row_number() OVER
             |  (ORDER BY freq DESC, word) AS rn FROM wf),
             |t AS (SELECT CAST(sum(freq) AS BIGINT) AS tot,
             |  CAST(count(*) AS BIGINT) AS v FROM wf),
             |ks AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS k)
             |SELECT ks.k, least(CAST(ks.k AS BIGINT), t.v) AS vocab_used,
             |  CAST(sum(r.freq) AS BIGINT) AS covered,
             |  round(sum(r.freq) * 1.0 / t.tot, 6) AS coverage
             |FROM ks JOIN r ON r.rn <= ks.k CROSS JOIN t
             |GROUP BY ks.k, t.v, t.tot ORDER BY ks.k""".stripMargin)),

    // Positional phrase search: the top-5 corpus trigrams (by count,
    // phrase tiebreak) are searched the INVERTED-INDEX way — positional
    // postings (token, doc, pos) filtered to the phrase vocabulary,
    // then intersected with pos+1/pos+2 arithmetic — while the oracle
    // counts the same occurrences by scanning exploded trigrams. The
    // two routes agreeing is the claim: the index plan never rescans
    // text, and the posting join is pruned by a broadcast token set
    // BEFORE it shuffles (at 100 TB the postings are the stored index;
    // a phrase probe moves only the query tokens' posting lists).
    Q(
      "t27_phrase_search",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
        // phrase selection: top-5 trigrams
        val tris = toks.where(size($"t") >= 3)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(t)-3), " +
              "i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")).as("ph"))
        val top = tris.groupBy($"ph").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), $"ph").limit(5)
          .select($"ph", split($"ph", " ").as("ws"))
        // the index leg: positional postings pruned to phrase tokens
        val post = toks
          .select($"doc_id", posexplode($"t")).toDF("doc_id", "pos", "w")
        val vocab = top.select(explode($"ws").as("w")).distinct()
        val pruned = post.join(broadcast(vocab), "w")
        val p1 = pruned.select($"w".as("w1"), $"doc_id", $"pos")
        val p2 = pruned.select($"w".as("w2"), $"doc_id",
          ($"pos" - 1).as("pos"))
        val p3 = pruned.select($"w".as("w3"), $"doc_id",
          ($"pos" - 2).as("pos"))
        p1.join(p2, Seq("doc_id", "pos")).join(p3, Seq("doc_id", "pos"))
          .join(broadcast(top.select($"ph",
            $"ws"(0).as("w1"), $"ws"(1).as("w2"), $"ws"(2).as("w3"))),
            Seq("w1", "w2", "w3"))
          .groupBy($"ph", $"doc_id")
          .agg(count(lit(1)).as("n_matches"))
          .select($"ph".as("phrase"), $"doc_id", $"n_matches")
          .orderBy($"phrase", $"doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |tri AS (SELECT doc_id, unnest(list_transform(range(len(t)-2),
             |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS ph
             |  FROM tok WHERE len(t) >= 3),
             |top5 AS (SELECT ph FROM (SELECT ph, count(*) AS cnt FROM tri
             |  GROUP BY ph ORDER BY cnt DESC, ph LIMIT 5))
             |SELECT tri.ph AS phrase, tri.doc_id,
             |  count(*) AS n_matches
             |FROM tri JOIN top5 USING (ph)
             |GROUP BY tri.ph, tri.doc_id
             |ORDER BY phrase, doc_id""".stripMargin))
  )

  private lazy val t25OracleSql: String =
    s"""WITH RECURSIVE
       |${bpeCtesSql.stripPrefix("WITH ")},
       |${unigramCtesSql(64, 6).stripPrefix("WITH RECURSIVE\n")},
       |bdict AS (SELECT word,
       |  CAST(len(string_split(repr, chr(31))) - 1 AS BIGINT) AS bpe_ntok
       |  FROM r20),
       |udict AS (SELECT word, CAST(count(*) AS BIGINT) AS uni_ntok
       |  FROM wk2 WHERE pos > 0 GROUP BY word)
       |SELECT w.word, w.freq, b.bpe_ntok, u.uni_ntok,
       |  b.bpe_ntok - u.uni_ntok AS delta
       |FROM wf w JOIN bdict b USING (word) JOIN udict u USING (word)
       |WHERE b.bpe_ntok <> u.uni_ntok
       |ORDER BY w.freq DESC, w.word""".stripMargin

  private def t24OracleSql: String = {
    val lim = 20
    def ladder(c: String): String =
      (1 to lim).map(b => s"WHEN $c < ${1L << b} THEN $b")
        .mkString("CASE ", " ", s" ELSE ${lim + 1} END")
    def vladder(c: String): String =
      (1 to lim).map(b =>
        s"WHEN $c < ${1L << b} THEN CAST(ceil($b / 7.0) AS INT)")
        .mkString("CASE ", " ", s" ELSE ${(lim + 7) / 7 + 1} END")
    s"""WITH tok AS (SELECT doc_id,
       |  unnest(list_distinct(${tokSql()})) AS term FROM documents),
       |p AS (SELECT term, list_sort(list(doc_id)) AS ids
       |  FROM tok GROUP BY term HAVING count(*) >= 3),
       |g AS (SELECT term, ids, list_transform(range(1, len(ids) + 1),
       |  i -> CASE WHEN i = 1 THEN ids[1] + 1
       |    ELSE ids[i] - ids[i - 1] END) AS gaps FROM p)
       |SELECT term, CAST(len(ids) AS BIGINT) AS n_docs,
       |  CAST(list_max(gaps) AS BIGINT) AS max_gap,
       |  CAST((${ladder("list_max(gaps)")}) AS BIGINT) AS for_bits,
       |  CAST((len(ids) * (${ladder("list_max(gaps)")}) + 7) // 8
       |    AS BIGINT) AS for_bytes,
       |  CAST(list_sum(list_transform(gaps, g -> ${vladder("g")}))
       |    AS BIGINT) AS varint_bytes,
       |  round(list_sum(list_transform(gaps, g -> ${vladder("g")}))
       |    * 1.0 / (len(ids) * 8), 6) AS ratio_vs_raw
       |FROM g ORDER BY term""".stripMargin
  }

  private def unigramFertilityOracleSql: String =
    s"""${unigramCtesSql(64, 6)},
              |dict AS (SELECT word, count(*) AS n_sub FROM wk2
              |  WHERE pos > 0 GROUP BY word),
              |dw AS (SELECT doc_id, lang,
              |  unnest(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS word
              |  FROM documents),
              |pd AS (SELECT doc_id, lang, count(*) AS nw,
              |  CAST(sum(n_sub) AS BIGINT) AS ns
              |  FROM dw JOIN dict USING (word) GROUP BY doc_id, lang)
              |SELECT lang, count(*) AS n_docs,
              |  CAST(sum(nw) AS BIGINT) AS n_words,
              |  CAST(sum(ns) AS BIGINT) AS n_subwords,
              |  round(CAST(sum(CAST(ns * 1.0 / nw AS DECIMAL(38,18))) AS DOUBLE)
              |    / count(*), 6) AS uni_fertility
              |FROM pd GROUP BY lang ORDER BY lang""".stripMargin

  /** One Viterbi DP pass as a recursive CTE: per word type, carry the
    * (best, back) arrays one character at a time; candidate costs come
    * from the score map CTE with the engine's 1e18 missing sentinel,
    * and list_position picks the FIRST minimal predecessor exactly like
    * the engine's ascending strict-< scan.
    */
  private def unigramDpSql(name: String, mapCte: String, maxLen: Int): String =
    s"""$name AS (
       |  SELECT word, freq, 0 AS i, CAST([] AS DOUBLE[]) AS costs,
       |    [CAST(0 AS DOUBLE)] AS best, [0] AS back FROM wt
       |  UNION ALL
       |  SELECT word, freq, i + 1,
       |    list_transform(range(greatest(0, i+1-$maxLen), i+1),
       |      j -> best[j+1] + coalesce(map_extract($mapCte.m,
       |        substr(word, j+1, i+1-j))[1], 1e18)) AS c2,
       |    list_append(best, list_min(c2)),
       |    list_append(back, greatest(0, i+1-$maxLen) - 1
       |      + list_position(c2, list_min(c2)))
       |  FROM $name, $mapCte WHERE i < length(word))""".stripMargin

  /** Backpointer walk: pos -> back[pos+1] until 0; each step's substring
    * is one emitted piece.
    */
  private def unigramWalkSql(name: String, dpf: String): String =
    s"""$name AS (
       |  SELECT word, freq, length(word) AS pos, back FROM $dpf
       |  UNION ALL
       |  SELECT word, freq, back[pos+1], back FROM $name WHERE pos > 0)""".stripMargin

  private def unigramOracleSql(v: Int, maxLen: Int): String =
    s"""${unigramCtesSql(v, maxLen)},
       |u2 AS (SELECT substr(word, back[pos+1]+1, pos - back[pos+1]) AS piece,
       |  CAST(sum(freq) AS BIGINT) AS n_used FROM wk2 WHERE pos > 0 GROUP BY 1)
       |SELECT u2.piece, u2.n_used, n1.nll FROM u2 JOIN n1 USING (piece)
       |ORDER BY piece""".stripMargin

  /** The shared unigram-tokenizer CTE chain: word types -> seed vocab ->
    * round-1 DP + walk -> usage re-estimate (n1) -> round-2 DP + walk
    * (wk2, the final segmentation).
    */
  private def unigramCtesSql(v: Int, maxLen: Int): String =
    s"""WITH RECURSIVE
       |tk AS (SELECT regexp_extract_all(lower(text), '[a-zA-Z]+') AS tks
       |  FROM documents),
       |wt AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(tks) AS w FROM tk) GROUP BY w),
       |sub AS MATERIALIZED (SELECT substr(word, i, l) AS piece, sum(freq) AS cnt
       |  FROM wt, unnest(range(1, length(word)+1)) AS a(i),
       |    unnest(range(1, $maxLen+1)) AS b(l)
       |  WHERE i + l - 1 <= length(word) GROUP BY 1),
       |v0 AS MATERIALIZED (SELECT piece, cnt FROM sub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM sub
       |    WHERE length(piece) >= 2 ORDER BY cnt DESC, piece LIMIT $v)),
       |t0 AS (SELECT sum(cnt) AS tot FROM v0),
       |n0 AS MATERIALIZED (SELECT piece, round(-ln(cnt * 1.0 / tot), 6) AS nll
       |  FROM v0, t0),
       |m0c AS MATERIALIZED (SELECT map(list(piece ORDER BY piece),
       |  list(nll ORDER BY piece)) AS m FROM n0),
       |${unigramDpSql("dp1", "m0c", maxLen)},
       |dpf1 AS (SELECT word, freq, back FROM dp1 WHERE i = length(word)),
       |${unigramWalkSql("wk1", "dpf1")},
       |u1 AS MATERIALIZED (SELECT substr(word, back[pos+1]+1, pos - back[pos+1]) AS piece,
       |  sum(freq) AS cnt FROM wk1 WHERE pos > 0 GROUP BY 1),
       |t1 AS (SELECT sum(cnt) AS tot FROM u1),
       |n1 AS MATERIALIZED (SELECT piece, round(-ln(cnt * 1.0 / tot), 6) AS nll
       |  FROM u1, t1),
       |m1c AS MATERIALIZED (SELECT map(list(piece ORDER BY piece),
       |  list(nll ORDER BY piece)) AS m FROM n1),
       |${unigramDpSql("dp2", "m1c", maxLen)},
       |dpf2 AS (SELECT word, freq, back FROM dp2 WHERE i = length(word)),
       |${unigramWalkSql("wk2", "dpf2")}""".stripMargin

  /** The 20 BPE merge stages unrolled as materialized CTEs (the tr01
    * unrolled-iteration pattern), ending with the winner tables b1..b20
    * and the final word-type symbol table r20. Stage i derives pair
    * counts from stage i−1's symbol table, picks the (cnt DESC, l, r)
    * winner, and rewrites every word with the same greedy left-to-right
    * fold the engine's `aggregate()` performs — `list_reduce` seeds
    * from the first symbol exactly like the engine seeds from
    * `element_at(_, 1)`. Shared by the t15 (merge table) and t16
    * (subword counts) oracles.
    */
  private[queries] lazy val bpeCtesSql: String = {
    val n = 20
    val sb = new StringBuilder
    sb ++=
      """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text),'[a-zA-Z]+')) AS word FROM documents),
        |wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY word),
        |r0 AS MATERIALIZED (SELECT word, freq,
        |  array_to_string(regexp_extract_all(word, '.'), chr(31)) || chr(31) || '$' AS repr FROM wf)""".stripMargin
    for (i <- 1 to n) {
      sb ++= s""",
        |p$i AS (SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |  SELECT freq, syms[i] AS l, syms[i+1] AS r FROM
        |    (SELECT freq, string_split(repr, chr(31)) AS syms FROM r${i - 1}),
        |    unnest(range(1, len(syms))) AS t(i)) GROUP BY l, r),
        |b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
        |r$i AS MATERIALIZED (SELECT word, freq, list_reduce(string_split(repr, chr(31)), (acc, x) ->
        |  CASE WHEN (acc = b.l OR ends_with(acc, chr(31) || b.l)) AND x = b.r
        |    THEN substr(acc, 1, length(acc) - length(b.l)) || b.l || b.r
        |    ELSE acc || chr(31) || x END) AS repr FROM r${i - 1}, b$i b)""".stripMargin
    }
    sb.toString
  }

  /** t15 oracle: the shared BPE stage chain + the merge-table union. */
  private lazy val t15OracleSql: String =
    bpeCtesSql + (1 to 20)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, l, r, l || r AS merged, cnt FROM b$i")
      .mkString("\n", "\nUNION ALL ", "\nORDER BY step")

  /** t13's BM25 pipeline as CTEs ending in `bm(doc_id, dl, c_spark,
    * c_join, c_window, score)` — shared by the t13 gate query and
    * t14's rank-fusion oracle. Every literal is pinned `::DOUBLE` and
    * the expression tree associates exactly as [[graft.operators.Bm25]]
    * does (the k1+1 literal is re-derived as `1.2+1.0` so both engines
    * perform the identical addition).
    */
  private[queries] lazy val bm25CtesSql: String =
    """WITH t AS (SELECT doc_id,
      |  regexp_extract_all(lower(text), '[a-zA-Z]+') AS tok FROM documents),
      |base AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl, tok FROM t),
      |corpus AS (SELECT count(*) AS n_docs,
      |  CAST(sum(len(tok)) AS BIGINT) AS sum_dl FROM t),
      |tf AS (SELECT doc_id, dl, tok2 AS tok, count(*) AS tf FROM
      |  (SELECT doc_id, dl, unnest(tok) AS tok2 FROM base)
      |  WHERE tok2 IN ('spark', 'join', 'window')
      |  GROUP BY doc_id, dl, tok2),
      |dfx AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
      |sc AS (SELECT tf.doc_id, tf.dl,
      |  tf.tok,
      |  ln((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE) + 1.0::DOUBLE)
      |    * (tf * (1.2::DOUBLE + 1.0::DOUBLE))
      |    / (tf + 1.2::DOUBLE * (0.25::DOUBLE
      |        + 0.75::DOUBLE * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
      |    AS contrib
      |  FROM tf JOIN dfx USING (tok) CROSS JOIN corpus),
      |piv AS (SELECT doc_id, dl,
      |  round(coalesce(max(CASE WHEN tok = 'spark' THEN contrib END), 0.0), 6) AS c_spark,
      |  round(coalesce(max(CASE WHEN tok = 'join' THEN contrib END), 0.0), 6) AS c_join,
      |  round(coalesce(max(CASE WHEN tok = 'window' THEN contrib END), 0.0), 6) AS c_window
      |  FROM sc GROUP BY doc_id, dl),
      |bm AS (SELECT doc_id, dl, c_spark, c_join, c_window,
      |  round(c_spark + c_join + c_window, 6) AS score FROM piv)""".stripMargin
}
