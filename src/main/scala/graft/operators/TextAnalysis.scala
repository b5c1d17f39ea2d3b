package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.text.StopWords

/** Corpus-quality operators for training-data curation (SURVEY.md §7.5):
  * language ID, quality scoring, token counting, fingerprinting. All but
  * the fingerprint are pure Catalyst expressions (oracle-checkable and
  * codegen'd); the fingerprint is a per-row rolling hash UDF.
  */
object TextAnalysis {

  /** Tiny high-frequency function-word lexicons for the n-gram/stopword
    * voting heuristic. Public-knowledge word lists.
    */
  val lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it",
      "for", "was", "with", "are", "this", "have", "from", "not"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une",
      "est", "que", "pour", "dans", "qui", "pas", "sur", "vous"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "en", "un", "una",
      "es", "que", "por", "con", "para", "del", "se", "no"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
      "ein", "eine", "zu", "nicht", "auf", "sich", "dem", "des"))

  /** Heuristic language guess over lowercase word tokens: CJK char
    * presence wins for "zh"; otherwise the function-word lexicon with the
    * most votes (ties broken by lexicon order en,fr,es,de); "und"
    * (undetermined) when no lexicon matches.
    */
  def languageId(text: Column): Column =
    // Native one-pass form of: Han-char probe → lexicon votes over
    // split(lower(text), "[^a-zA-Z]+") → greatest with en,fr,es,de tie
    // order → "und". The composed-builtin original repeated the
    // O(tokens × lexicon) vote subexpression ~6× through the
    // greatest/when chain; see [[graft.functions.TextNative]].
    graft.functions.TextNative.lang_id(text)

  def punctRatio(text: Column): Column =
    // one-pass native counter = length(regexp_replace(text,
    // "[A-Za-z0-9\\s]", "")) without materializing the stripped string
    graft.functions.TextNative.punct_count(text).cast("double") /
      greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    graft.functions.TextNative.digit_count(text).cast("double") /
      greatest(length(text), lit(1))

  def stopwordRatio(tokens: Column): Column =
    // hashed-set occurrence count (duplicates counted), identical to
    // size(filter(tokens, array_contains(<nltk list>, t)))
    graft.functions.TextNative.nltk_stop_count(tokens).cast("double") /
      greatest(size(tokens), lit(1))

  def meanWordLen(tokens: Column): Column =
    aggregate(tokens, lit(0.0), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(tokens), lit(1))

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation/digit noise and a natural stopword share. Weights are
    * engine policy (no reference equivalent), fixed for determinism.
    */
  def qualityScore(text: Column, tokens: Column): Column = {
    val lenScore = least(size(tokens).cast("double") / 64.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    val digitOk = lit(1.0) - least(digitRatio(text) * 4.0, lit(1.0))
    val stopOk = lit(1.0) - abs(stopwordRatio(tokens) - lit(0.4))
    round(lenScore * 0.3 + punctOk * 0.25 + digitOk * 0.2 + stopOk * 0.25, 6)
  }

  /** Unigram Shannon entropy (bits) of a token array — the
    * lexical-diversity signal (spam/keyword-stuffing scores low).
    * Row-local fold over the one-pass token_counts map. Accumulates
    * p·log2(1/p) — all non-negative terms — rather than negating a
    * sum: a single-token doc must yield +0.0, not -0.0 (whose string
    * form hashes differently across engines). Empty input → 0.0.
    */
  def tokenEntropy(tokens: Column): Column = {
    val n = size(tokens).cast("double")
    val counts = map_values(graft.functions.TextNative.token_counts(tokens))
    when(size(tokens) === 0, lit(0.0)).otherwise(
      aggregate(counts, lit(0.0), (acc, c) =>
        acc + (c.cast("double") / n) * log(2.0, n / c.cast("double"))))
  }

  /** Whitespace token count (the cheap length signal). */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** BPE-ish token count: word pieces + isolated non-word symbols —
    * the standard pre-tokenizer shape `\w+|[^\w\s]`.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** 64-bit polynomial rolling fingerprint (base-31, wrapping mod 2^64);
    * deterministic content id usable for doc-level caching/sharding.
    */
  private val fingerprintUdf = udf { (s: String) =>
    if (s == null) 0L
    else {
      var h = 1125899906842597L
      var i = 0
      while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
      h
    }
  }
  def fingerprint(text: Column): Column = fingerprintUdf(text)

  /** PII-style scrubbing for training-data curation: URLs, then emails,
    * then phone-shaped digit runs are replaced by typed placeholders.
    * Order matters (a URL may contain an @) and is part of the operator
    * contract. Patterns deliberately stay in the RE2-compatible subset
    * (no lookaround) so engine-independent oracles replay them exactly;
    * everything is codegen'd `regexp_replace` — a narrow map at any
    * scale.
    */
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Per-kind match counts (for curation stats / filter decisions). */
  def piiCounts(text: Column): Column = struct(
    size(regexp_extract_all(text, lit(UrlRe), lit(0))).as("n_urls"),
    size(regexp_extract_all(regexp_replace(text, UrlRe, "<URL>"),
      lit(EmailRe), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phones"))

  /** Language purity / code-switching rate: per document, the fraction
    * of its sentences (the reference's split('.') semantics) whose
    * [[languageId]] vote agrees with the document-level vote. Mixed-
    * language docs poison language-bucketed mixtures and fertility
    * budgets, so multilingual curation gates on this before bucketing.
    *
    * The doc-level vote is computed in a projection BELOW the sentence
    * Generate — once per document, not once per exploded sentence row
    * (inlining it next to the explode would re-evaluate the full-text
    * lexicon scan per sentence). Docs with no non-empty sentence drop
    * out. Output: (doc_id, doc_lang, n_sent, n_match, purity).
    */
  def languagePurity(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("doc_id"), languageId(col(textCol)).as("doc_lang"),
        col(textCol).as("t"))
      .select(col("doc_id"), col("doc_lang"),
        explode(split(col("t"), "\\.")).as("sentence"))
      .select(col("doc_id"), col("doc_lang"),
        trim(col("sentence")).as("sentence"))
      .filter(length(col("sentence")) > 0)
      .select(col("doc_id"), col("doc_lang"),
        languageId(col("sentence")).as("sent_lang"))
      .groupBy(col("doc_id"), col("doc_lang"))
      .agg(count(lit(1)).as("n_sent"),
        sum(when(col("sent_lang") === col("doc_lang"), 1L).otherwise(0L))
          .as("n_match"))
      .select(col("doc_id"), col("doc_lang"), col("n_sent"), col("n_match"),
        round(col("n_match") * 1.0 / col("n_sent"), 6).as("purity"))

  /** LZ78 phrase count over the first `prefixLen` characters — the
    * compression-ratio quality signal (the Gopher/RefinedWeb rules use
    * compressibility as a repetition proxy: boilerplate and template
    * spam parse into FEW long phrases, natural prose into many short
    * ones). Classic LZ78 incremental parse: grow the current phrase
    * while (phrase + next char) is already in the dictionary, else
    * emit + add it and restart.
    *
    * One row-local `aggregate` fold over the char array — integer and
    * string ops only (bit-identical across engines), codegen'd, no
    * shuffle; the prefix bound caps the quadratic dictionary scan at
    * prefixLen^2 steps per document regardless of document size.
    * Returns the phrase count (the unterminated tail phrase counts as
    * one).
    */
  def lzPhrases(textCol: String, prefixLen: Int): Column = {
    val t = s"`$textCol`"
    // sequence(1, 0) would run DESCENDING on an empty prefix — guard it
    expr(
      s"""if(length(substring($t, 1, $prefixLen)) = 0, 0, aggregate(
         |  transform(sequence(1, length(substring($t, 1, $prefixLen))),
         |    i -> substring(substring($t, 1, $prefixLen), i, 1)),
         |  named_struct('dict', cast(array() as array<string>),
         |    'cur', '', 'cnt', 0),
         |  (acc, ch) -> if(array_contains(acc.dict, concat(acc.cur, ch)),
         |    named_struct('dict', acc.dict,
         |      'cur', concat(acc.cur, ch), 'cnt', acc.cnt),
         |    named_struct('dict', concat(acc.dict,
         |        array(concat(acc.cur, ch))),
         |      'cur', '', 'cnt', acc.cnt + 1)),
         |  acc -> acc.cnt + if(acc.cur = '', 0, 1)))""".stripMargin)
  }
}
