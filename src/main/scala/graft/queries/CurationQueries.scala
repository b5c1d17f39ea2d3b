package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis => TA}
import graft.tables.Tables
import graft.text.{TextFunctions => TF}

/** The end-to-end training-data curation pipeline — the composition a
  * 100 TB pretraining corpus actually runs, as ONE declarative plan:
  *
  *   quality scoring → language-ID gate → exact near-dup canonicalization
  *   (min doc_id per content hash) → curated corpus + per-language stats.
  *
  * Every stage reuses an operator that is individually oracle-green
  * (a01 quality, a02 lang-ID, d01 content hashes), and the composed
  * oracle replays the whole pipeline in SQL — so the gate checks the
  * STAGES COMPOSE, not just that each works alone.
  *
  * Scale shape: narrow per-row expressions (quality, lang, hash), one
  * hash-shuffle for the canonical-copy window (partitioned BY HASH — no
  * global window), one partial-aggregated groupBy for the stats. No
  * driver loops, no collects.
  */
object CurationQueries extends QueryProvider {


  /** Rounded quality-score filter threshold (filter on the ROUNDED
    * value on both sides — oracle parity rule).
    */
  private val MinQuality = 0.5

  /** Mixture spec: keep-threshold out of 1024 hash buckets per language
    * (en 75%, fr/es 50%, de/zh 25%, anything else 12.5%).
    */
  private val MixRates1024: Map[String, Int] =
    Map("en" -> 768, "fr" -> 512, "es" -> 512, "de" -> 256, "zh" -> 256)

  /** Spark-side curated-doc plan: (doc_id, lang, quality, ws_tokens),
    * quality-gated, lang-verified, canonical copy per content hash.
    */
  private def curated(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    val tok = TF.tokenize($"text")
    val scored = graft.Par.fanOut(Tables.documents(s, dir))
      .select($"doc_id", $"lang",
        TA.wsTokenCount($"text").cast("long").as("ws_tokens"),
        round(TA.qualityScore($"text", tok), 6).as("quality"),
        TA.languageId($"text").as("guessed"),
        md5(Dedup.normalized($"text")).as("content_hash"))
      .filter($"quality" >= MinQuality && $"guessed" === $"lang")
    val canon = Window.partitionBy($"content_hash")
    scored
      .withColumn("keeper", min($"doc_id").over(canon))
      .filter($"doc_id" === $"keeper")
      .select($"doc_id", $"lang", $"quality", $"ws_tokens")
  }

  /** The a01 quality + a02 lang-ID + d01 hash fragments composed into
    * one WITH chain ending in `curated`.
    */
  private val curatedSql: String = {
    s"""base AS (SELECT doc_id, lang, text,
       |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok,
       |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk FROM documents),
       |m AS (SELECT *,
       |  ${TextSql.ratioItems}
       |  FROM base),
       |q AS (SELECT doc_id, lang, text,
       |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
       |  ${TextSql.qualityExpr("len(tok)")} AS quality,
       |  ${TextSql.voteItems}
       |  FROM m),
       |g AS (SELECT *,
       |  ${TextSql.guessedCase} AS guessed
       |  FROM q),
       |gated AS (SELECT doc_id, lang, quality, ws_tokens,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
       |  FROM g WHERE quality >= $MinQuality AND guessed = lang),
       |curated AS (SELECT doc_id, lang, quality, ws_tokens FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY content_hash) AS keeper
       |    FROM gated)
       |  WHERE doc_id = keeper)""".stripMargin
  }

  override val all: Seq[Q] = Seq(

    // The curated corpus itself — per-document decisions hash-checked.
    Q(
      "c01_curated_docs",
      (s, dir) => {
        import s.implicits._
        curated(s, dir).orderBy($"doc_id")
      },
      Some(s"""WITH $curatedSql
              |SELECT doc_id, lang, quality, ws_tokens
              |FROM curated ORDER BY doc_id""".stripMargin),
      bench = true),

    // Per-language corpus stats over the curated set (the reporting
    // stage of the pipeline).
    Q(
      "c02_curated_stats",
      (s, dir) => {
        import s.implicits._
        curated(s, dir)
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"ws_tokens").as("total_tokens"),
            round(avg($"quality"), 6).as("mean_quality"))
          .orderBy($"lang")
      },
      Some(s"""WITH $curatedSql
              |SELECT lang, count(*) AS n_docs,
              |CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
              |round(avg(quality), 6) AS mean_quality
              |FROM curated GROUP BY lang ORDER BY lang""".stripMargin)),

    // Deterministic train/val/test assignment by content-independent
    // hash bucketing — the production split technique (reproducible
    // across runs, engines and re-shards, unlike `df.sample`, whose RNG
    // stream is implementation-defined and thus un-oracle-able). FNV of
    // the canonical id string mod 100 → 80/10/10.
    Q(
      "c03_hash_split",
      (s, dir) => {
        import s.implicits._
        val bucket = pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
          lit(100L)).cast("int")
        Tables.documents(s, dir)
          .select($"doc_id", bucket.as("bucket"),
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH h0 AS (SELECT doc_id,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hs
              |  FROM documents),
              |h AS (SELECT doc_id,
              |  CAST(((hs % 100) + 100) % 100 AS INTEGER) AS bucket FROM h0)
              |SELECT doc_id, bucket,
              |CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
              |  ELSE 'test' END AS split
              |FROM h ORDER BY doc_id""".stripMargin)),

    // Deterministic stratified mixture sampling — dataset mixing with
    // per-language keep rates (the "sample en at 75%, zh at 25%"
    // re-weighting every pretraining corpus applies). Same hash-bucket
    // technique as c03, with a power-of-two modulus so the signed Spark
    // `& 1023` and the oracle's unsigned `% 1024` agree bit-for-bit.
    // Narrow per-row filter, no shuffle at all: at 100 TB this is a
    // pure scan-and-keep whose selectivity is exactly the mixture spec,
    // reproducible across runs and engines.
    Q(
      "c04_mixture_sample",
      (s, dir) => {
        import s.implicits._
        val bucket = graft.functions.Fnv.fnv1a64($"doc_id".cast("string"))
          .bitwiseAND(lit(1023L)).cast("int")
        val keep = typedLit(MixRates1024)
        Tables.documents(s, dir)
          .select($"doc_id", $"lang", $"source", bucket.as("bucket"),
            coalesce(keep($"lang"), lit(128)).as("keep_below"))
          .filter($"bucket" < $"keep_below")
          .orderBy($"doc_id")
      },
      Some {
        val cases = MixRates1024
          .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
        s"""WITH h AS (SELECT doc_id, lang, source,
           |  CAST(${FnvSql.ofString("(doc_id::VARCHAR)")} % 1024::HUGEINT AS INTEGER) AS bucket
           |  FROM documents),
           |k AS (SELECT *, CASE lang $cases ELSE 128 END AS keep_below FROM h)
           |SELECT doc_id, lang, source, bucket, keep_below
           |FROM k WHERE bucket < keep_below ORDER BY doc_id""".stripMargin
      }),

    // The assembled pretraining-corpus flow: mixture-sample (c04) →
    // decontaminate against the benchmark subset (d09's shingle
    // semi-join, as an ANTI join) → deterministic split (c03) →
    // per-(lang, split) token budget. Every stage is individually
    // oracle-green; this gates that they COMPOSE in one declarative
    // plan: narrow hash filters, one broadcast anti-join, one final
    // partial-aggregated groupBy — no driver loop, three shuffles
    // total (benchmark shingle distinct, anti-join probe aggregate,
    // final stats) regardless of corpus size.
    Q(
      "c05_corpus_assembly",
      (s, dir) => {
        import s.implicits._
        val fnv = (c: org.apache.spark.sql.Column) =>
          graft.functions.Fnv.fnv1a64(c.cast("string"))
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val keep = typedLit(MixRates1024)
        val sampled = docs
          .filter($"doc_id" % 50 =!= 0) // benchmark rows never train
          .filter(fnv($"doc_id").bitwiseAND(lit(1023L)) <
            coalesce(keep($"lang"), lit(128)))
        val benchGrams = docs.filter($"doc_id" % 50 === 0)
          .select(explode(array_distinct(
            Dedup.shingles(TF.tokenize($"text"), 4))).as("g")).distinct()
        val contaminated = docs.filter($"doc_id" % 50 =!= 0)
          .select($"doc_id", explode(array_distinct(
            Dedup.shingles(TF.tokenize($"text"), 4))).as("g"))
          .join(broadcast(benchGrams), Seq("g"))
          .select($"doc_id").distinct()
        sampled.join(contaminated, Seq("doc_id"), "left_anti")
          .select($"doc_id", $"lang",
            when(pmod(fnv($"doc_id"), lit(100L)) < 80, "train")
              .when(pmod(fnv($"doc_id"), lit(100L)) < 90, "val")
              .otherwise("test").as("split"),
            TA.wsTokenCount($"text").cast("long").as("ws_tokens"))
          .groupBy($"lang", $"split")
          .agg(count(lit(1)).as("n_docs"), sum($"ws_tokens").as("total_tokens"))
          .orderBy($"lang", $"split")
      },
      Some {
        val cases = MixRates1024
          .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
        s"""WITH hs AS (SELECT *,
           |    ${FnvSql.ofString("(doc_id::VARCHAR)")} AS hu FROM documents),
           |sampled AS (SELECT * FROM hs WHERE doc_id % 50 <> 0
           |  AND CAST(hu % 1024::HUGEINT AS INTEGER) <
           |      (CASE lang $cases ELSE 128 END)),
           |t AS (SELECT doc_id,
           |    regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
           |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk)-2),
           |    i -> array_to_string(tk[i:i+3], ' '))) AS g FROM t WHERE len(tk) >= 4),
           |b AS (SELECT DISTINCT unnest(g) AS g FROM sh WHERE doc_id % 50 = 0),
           |cont AS (SELECT DISTINCT doc_id FROM
           |  (SELECT doc_id, unnest(g) AS g FROM sh WHERE doc_id % 50 <> 0) c
           |  JOIN b USING (g)),
           |kept AS (SELECT *, ${FnvSql.toSigned("hu")} AS hsg FROM sampled
           |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
           |lab AS (SELECT lang,
           |  CASE WHEN ((hsg % 100) + 100) % 100 < 80 THEN 'train'
           |    WHEN ((hsg % 100) + 100) % 100 < 90 THEN 'val'
           |    ELSE 'test' END AS split,
           |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           |    AS ws_tokens
           |  FROM kept)
           |SELECT lang, split, count(*) AS n_docs,
           |CAST(sum(ws_tokens) AS BIGINT) AS total_tokens
           |FROM lab GROUP BY lang, split ORDER BY lang, split""".stripMargin
      }),

    // Context-window packing — the "concat the token stream, cut it
    // into ctx-length windows" step that turns a curated corpus into
    // training sequences. Deterministic distributed shape: docs are
    // hash-sharded (8 shards — in production, one per writer task) and
    // hash-ORDERED within each shard (the reproducible stand-in for
    // the training shuffle), then each doc's start offset is an
    // EXCLUSIVE per-shard running token count and its window id is
    // `offset div ctx`. One hash shuffle + per-shard sorted scan; no
    // global order, no driver state — shards pack in parallel at any
    // corpus size, and the assignment is a pure function of doc_id.
    Q(
      "c06_context_packing",
      (s, dir) => {
        import s.implicits._
        graft.operators.Packing.contextPack(
          Tables.documents(s, dir), "doc_id",
          TA.wsTokenCount($"text"), ctx = 2048L, shards = 8)
          .orderBy($"doc_id")
      },
      Some(s"""WITH h0 AS (SELECT doc_id,
              |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hs
              |  FROM documents),
              |sh AS (SELECT doc_id, n_tokens,
              |  CAST(((hs % 8) + 8) % 8 AS INTEGER) AS shard, hs FROM h0),
              |p AS (SELECT doc_id, shard, n_tokens,
              |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
              |    ORDER BY hs, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              |    AS start_offset
              |  FROM sh)
              |SELECT doc_id, shard, n_tokens, start_offset,
              |start_offset // 2048 AS window_id
              |FROM p ORDER BY doc_id""".stripMargin),
      bench = true),

    // Deterministic stratified sampling — EXACTLY k docs per language
    // (c04's hash-rate mixture keeps a proportion; audits and eval sets
    // need an exact count). Order within a stratum is the FNV hash of
    // the doc id: reproducible across runs/engines, uncorrelated with
    // ingest order. Scale shape: one shuffle on lang with the rank
    // filter pushed down as WindowGroupLimit — each map task forwards
    // at most k rows per stratum, so the window sees per-language
    // top-k candidates, not the corpus.
    Q(
      "c07_stratified_sample",
      (s, dir) => {
        import s.implicits._
        val SampleK = 25
        val h = graft.functions.Fnv.fnv1a64($"doc_id".cast("string"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"hkey", $"doc_id")
        Tables.documents(s, dir)
          .select($"doc_id", $"lang", h.as("hkey"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= SampleK)
          .select($"lang", $"rn".cast("long").as("rn"), $"doc_id", $"hkey")
          .orderBy($"lang", $"rn")
      },
      Some(s"""WITH h0 AS (SELECT doc_id, lang,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hkey
              |  FROM documents),
              |r AS (SELECT doc_id, lang, hkey, row_number() OVER
              |  (PARTITION BY lang ORDER BY hkey, doc_id) AS rn FROM h0)
              |SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, hkey
              |FROM r WHERE rn <= 25 ORDER BY lang, rn""".stripMargin)),

    // Per-language quality-percentile gate — "keep each language's top
    // half" (a fixed global threshold over-prunes low-resource
    // languages whose quality distribution sits lower). Exact median
    // per lang via one groupBy (same percentile definition a10 proved
    // against quantile_cont), broadcast back as a 5-row dim — a narrow
    // filter, not a per-row window over the whole stratum. At 100 TB
    // the exact per-lang percentile is one (lang, quality) shuffle;
    // the KLL/CMS-sketch route is the approximate alternative when
    // even that pass must be avoided.
    Q(
      "c08_quality_cutoff",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val scored = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang",
            round(TA.qualityScore($"text", tok), 6).as("quality"))
        val cuts = scored.groupBy($"lang")
          .agg(expr("percentile(quality, 0.5)").as("cut"))
        scored.join(broadcast(cuts), Seq("lang"))
          .filter($"quality" >= $"cut")
          .select($"doc_id", $"lang", $"quality", round($"cut", 6).as("cut"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH base AS (SELECT doc_id, lang, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, lang, text,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok
              |  FROM base),
              |q AS (SELECT doc_id, lang,
              |  ${TextSql.qualityExpr()} AS quality
              |  FROM m),
              |c AS (SELECT lang, quantile_cont(quality, 0.5) AS cut
              |  FROM q GROUP BY lang)
              |SELECT doc_id, q.lang, quality, round(cut, 6) AS cut
              |FROM q JOIN c ON c.lang = q.lang
              |WHERE quality >= cut ORDER BY doc_id""".stripMargin)),

    // Canonical-survivor selection: per exact-dup cluster keep the
    // highest-quality copy (smallest doc_id on ties) — c01's keeper
    // rule upgraded from "first seen" to "best". Spark side is a
    // max_by AGGREGATE over a struct order key — partial+final hash
    // agg, no per-cluster window sort; the oracle reaches the same
    // survivor through a window, pinning result-equivalence of the
    // two formulations.
    Q(
      "c09_canonical_survivor",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            round(TA.qualityScore($"text", tok), 6).as("quality"),
            md5(Dedup.normalized($"text")).as("content_hash"))
          .groupBy($"content_hash")
          .agg(count(lit(1)).as("n_docs"),
            max_by($"doc_id", struct($"quality", -$"doc_id")).as("canonical_id"),
            max($"quality").as("quality"))
          .orderBy($"content_hash")
      },
      Some(s"""WITH base AS (SELECT doc_id, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, text,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok
              |  FROM base),
              |q AS (SELECT doc_id,
              |  ${TextSql.qualityExpr()} AS quality,
              |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
              |  FROM m),
              |r AS (SELECT *, row_number() OVER (PARTITION BY content_hash
              |  ORDER BY quality DESC, doc_id) AS rn FROM q),
              |g AS (SELECT content_hash, count(*) AS n_docs,
              |  max(quality) AS quality FROM q GROUP BY content_hash)
              |SELECT g.content_hash, g.n_docs, r.doc_id AS canonical_id, g.quality
              |FROM g JOIN r ON r.content_hash = g.content_hash AND r.rn = 1
              |ORDER BY g.content_hash""".stripMargin)),

    // C4-style corpus-frequency boilerplate scrub: segments of the
    // token stream occurring in >= 5 distinct docs are boilerplate;
    // each doc is reassembled from its surviving segments in order.
    // Scale shape: the boilerplate dictionary is tiny by construction
    // and BROADCAST back — the scrub is a frequency count plus a
    // narrow map-side join (see operators/Boilerplate). The gate
    // hash-pins the reassembled text per doc (md5), the kept/dropped
    // split, and the oracle rebuilds segmentation, frequency, and
    // ordered reassembly relationally.
    Q(
      "c10_boilerplate_scrub",
      (s, dir) => {
        import s.implicits._
        graft.operators.Boilerplate
          .scrub(graft.Par.fanOut(Tables.documents(s, dir)),
            "doc_id", "text", segN = 3, minDocs = 5L)
          .orderBy($"doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |  regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
             |segs AS (SELECT doc_id, list_transform(range((len(tk)+2)//3),
             |  i -> array_to_string(tk[i*3+1 : i*3+3], ' ')) AS sg FROM tk),
             |e AS (SELECT doc_id, unnest(range(len(sg))) AS spos,
             |  unnest(sg) AS seg FROM segs),
             |f AS (SELECT seg FROM (SELECT seg, count(DISTINCT doc_id) AS nd
             |  FROM e GROUP BY seg) WHERE nd >= 5),
             |j AS (SELECT e.doc_id, e.spos, e.seg, (f.seg IS NOT NULL) AS dropped
             |  FROM e LEFT JOIN f ON f.seg = e.seg)
             |SELECT doc_id,
             |CAST(count(*) FILTER (WHERE NOT dropped) AS BIGINT) AS n_kept,
             |CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_dropped,
             |md5(coalesce(string_agg(seg, ' ' ORDER BY spos)
             |  FILTER (WHERE NOT dropped), '')) AS scrubbed_hash
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Per-source token-budget fill: each source contributes documents
    // in deterministic FNV-hash order until its token budget is
    // reached — the quota step that turns per-source mixture WEIGHTS
    // into an actual bounded corpus (c04 keeps a proportion; this
    // keeps a token count). One shuffle partitioned by source; the
    // running sum is a per-source window, never global, and the
    // inclusive-cum <= budget cut is a pure function of (doc_id,
    // source) — reproducible across runs, engines and re-shards.
    Q(
      "c11_token_budget_fill",
      (s, dir) => {
        import s.implicits._
        val Budget = 600L
        val w = Window.partitionBy($"source").orderBy($"hkey", $"doc_id")
        Tables.documents(s, dir)
          .select($"doc_id", $"source",
            TA.wsTokenCount($"text").cast("long").as("ws_tokens"),
            graft.functions.Fnv.fnv1a64($"doc_id".cast("string")).as("hkey"))
          .withColumn("cum", sum($"ws_tokens").over(w))
          .filter($"cum" <= Budget)
          .select($"doc_id", $"source", $"ws_tokens", $"cum")
          .orderBy($"doc_id")
      },
      Some(s"""WITH h AS (SELECT doc_id, source,
              |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
              |    AS ws_tokens,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hkey
              |  FROM documents),
              |c AS (SELECT doc_id, source, ws_tokens,
              |  CAST(sum(ws_tokens) OVER (PARTITION BY source
              |    ORDER BY hkey, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              |    AS cum
              |  FROM h)
              |SELECT doc_id, source, ws_tokens, cum
              |FROM c WHERE cum <= 600 ORDER BY doc_id""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis–Spirakis
    // exponential race) per source: each doc competes with key
    // -ln(u)/w — u deterministic from the low 20 bits of
    // FNV-1a(doc_id), w = n_chars — and the 10 smallest keys win, so
    // longer documents are proportionally likelier to be kept. The
    // weighted counterpart of c07's uniform stratified sample; same
    // scale shape (one shuffle on the stratum, rank filter pushed as
    // WindowGroupLimit). Keys are 9dp-rounded with doc_id tiebreaks on
    // both sides; the oracle replays the same hash bits, ln, and
    // division.
    Q(
      "c12_weighted_sample",
      (s, dir) => {
        import s.implicits._
        graft.operators.Sampling.weightedStratifiedSample(
          Tables.documents(s, dir).select($"doc_id", $"source", $"n_chars"),
          "doc_id", "source", $"n_chars", k = 10)
          .select($"source", $"rn".cast("long").as("rn"), $"doc_id",
            $"skey", $"n_chars")
          .orderBy($"source", $"rn")
      },
      Some(s"""WITH h0 AS (SELECT doc_id, source, n_chars,
              |  (${FnvSql.ofString("(doc_id::VARCHAR)")}) % 1048576 AS low20
              |  FROM documents),
              |k AS (SELECT doc_id, source, n_chars,
              |  round(-ln((low20 + 1)::DOUBLE / 1048576.0::DOUBLE)
              |    / n_chars, 9) AS skey
              |  FROM h0),
              |r AS (SELECT doc_id, source, n_chars, skey, row_number() OVER
              |  (PARTITION BY source ORDER BY skey, doc_id) AS rn FROM k)
              |SELECT source, CAST(rn AS BIGINT) AS rn, doc_id, skey, n_chars
              |FROM r WHERE rn <= 10 ORDER BY source, rn""".stripMargin)),

    // Curriculum buckets: exact equi-depth quality deciles per language
    // (the ordering step of curriculum learning / difficulty-staged
    // training). ntile(10) over (lang | quality, doc_id) is the exact
    // truth path — the window carries only a 3-column row per doc and
    // partitions by language, so each stratum sorts independently; at
    // 100 TB the same report would come from approx-quantile cuts
    // (sk03's sketch) with this as the verify slice. Quality is rounded
    // to 6dp BEFORE the order-by with doc_id tiebreaks, so the total
    // order (hence every bucket boundary) is engine-stable; ntile's
    // "earlier buckets get the remainder" sizing is identical SQL
    // semantics in Spark and DuckDB.
    Q(
      "c13_curriculum",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val scored = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang",
            round(TA.qualityScore($"text", tok), 6).as("quality"))
        val w = Window.partitionBy($"lang").orderBy($"quality", $"doc_id")
        scored
          .withColumn("bucket", ntile(10).over(w).cast("long"))
          .groupBy($"lang", $"bucket")
          .agg(count(lit(1)).as("n_docs"),
            min($"quality").as("lo"), max($"quality").as("hi"))
          .orderBy($"lang", $"bucket")
      },
      Some(s"""WITH base AS (SELECT doc_id, lang, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, lang, text,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok
              |  FROM base),
              |q AS (SELECT doc_id, lang,
              |  ${TextSql.qualityExpr()} AS quality
              |  FROM m),
              |b AS (SELECT lang, quality, ntile(10) OVER
              |  (PARTITION BY lang ORDER BY quality, doc_id) AS bucket FROM q)
              |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  min(quality) AS lo, max(quality) AS hi
              |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin)),

    // Split-leakage audit: near-duplicate pairs (d04's MinHash-LSH
    // pipeline) that STRADDLE c03's train/val/test hash split — the QA
    // query that catches eval contamination introduced by splitting
    // BEFORE deduplicating. The split tag is recomputed as a pure
    // function of each pair endpoint (same FNV bucket as c03) — a
    // narrow map over the pair list, NO join back to the corpus — so
    // the audit costs O(|pairs|) whatever the corpus size.
    Q(
      "c14_split_leakage",
      (s, dir) => {
        import s.implicits._
        def splitOf(c: org.apache.spark.sql.Column) = {
          val b = pmod(graft.functions.Fnv.fnv1a64(c.cast("string")),
            lit(100L))
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
        }
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.minhashNearDuplicates(toks, shingleN = 3, numHashes = 32,
          bands = 8, threshold = 0.3)
          .select($"a", $"b", round($"jaccard", 6).as("jaccard"),
            splitOf($"a").as("split_a"), splitOf($"b").as("split_b"))
          .filter($"split_a" =!= $"split_b")
          .orderBy($"a", $"b")
      },
      Some {
        def bucketOf(e: String) =
          s"(((${FnvSql.toSigned(FnvSql.ofString(e))} % 100) + 100) % 100)"
        s"""WITH ${DedupQueries.minhashPairCtes},
           |f AS (SELECT a, b, round(j, 6) AS jaccard,
           |  ${bucketOf("(a::VARCHAR)")} AS ba,
           |  ${bucketOf("(b::VARCHAR)")} AS bb
           |  FROM jac WHERE j >= 0.3)
           |SELECT a, b, jaccard,
           |  CASE WHEN ba < 80 THEN 'train' WHEN ba < 90 THEN 'val'
           |    ELSE 'test' END AS split_a,
           |  CASE WHEN bb < 80 THEN 'train' WHEN bb < 90 THEN 'val'
           |    ELSE 'test' END AS split_b
           |FROM f
           |WHERE (CASE WHEN ba < 80 THEN 'train' WHEN ba < 90 THEN 'val'
           |         ELSE 'test' END)
           |   <> (CASE WHEN bb < 80 THEN 'train' WHEN bb < 90 THEN 'val'
           |         ELSE 'test' END)
           |ORDER BY a, b""".stripMargin
      }),

    // Corpus datasheet — the per-(source, lang) manifest a dataset
    // card ships: documents, tokens, corpus token share, exact-dup
    // documents (corpus-wide normalized-hash count ≥ 2), mean quality.
    // One scan derives every per-doc fact; the report is two hash aggs
    // (per-group + the dup-hash count) joined to a broadcast totals
    // row. Mean quality accumulates as DECIMAL (Lloyd discipline) so
    // partition order is unobservable; shares divide longs.
    Q(
      "c15_datasheet",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val perDoc = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source", $"lang",
            size(tok).cast("long").as("ntok"),
            round(TA.qualityScore($"text", tok), 6).as("quality"),
            md5(Dedup.normalized($"text")).as("h"))
          .localCheckpoint()
        val dupHashes = perDoc.groupBy($"h")
          .agg(count(lit(1)).as("cnt"))
        val flagged = perDoc.join(broadcast(dupHashes), Seq("h"))
        val grp = flagged.groupBy($"source", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"ntok").as("n_tokens"),
            count(when($"cnt" >= 2, 1)).as("n_dup_docs"),
            (sum($"quality".cast("decimal(28,14)")).cast("double") /
              count(lit(1))).as("mean_q"))
        val tot = flagged.agg(sum($"ntok").as("tot_tokens"))
        grp.crossJoin(broadcast(tot))
          .select($"source", $"lang", $"n_docs", $"n_tokens", $"n_dup_docs",
            round($"n_tokens" / $"tot_tokens", 6).as("token_share"),
            round($"mean_q", 6).as("mean_quality"))
          .orderBy($"source", $"lang")
      },
      Some(s"""WITH base AS (SELECT doc_id, source, lang, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT doc_id, source, lang, text,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok
              |  FROM base),
              |pd AS (SELECT doc_id, source, lang,
              |  CAST(ntok AS BIGINT) AS ntok,
              |  ${TextSql.qualityExpr()} AS quality,
              |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
              |  FROM m),
              |dh AS (SELECT h, count(*) AS cnt FROM pd GROUP BY h),
              |f AS (SELECT pd.*, dh.cnt FROM pd JOIN dh USING (h)),
              |g AS (SELECT source, lang,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
              |  CAST(count(*) FILTER (WHERE cnt >= 2) AS BIGINT) AS n_dup_docs,
              |  CAST(sum(CAST(quality AS DECIMAL(28,14))) AS DOUBLE)
              |    / count(*) AS mean_q
              |  FROM f GROUP BY source, lang),
              |tot AS (SELECT CAST(sum(ntok) AS BIGINT) AS tot_tokens FROM pd)
              |SELECT source, lang, n_docs, n_tokens, n_dup_docs,
              |  round(n_tokens / tot_tokens, 6) AS token_share,
              |  round(mean_q, 6) AS mean_quality
              |FROM g CROSS JOIN tot ORDER BY source, lang""".stripMargin)),

    // Incremental ingest dedup — the "new batch against the standing
    // corpus" gate an append-only pipeline runs on every delivery
    // (docs with doc_id % 10 == 9 stand in for the incoming batch):
    // exact content hash, LEFT SEMI against the corpus hash set for
    // dup_of_corpus, a per-hash first-wins window WITHIN the batch for
    // dup_within_batch. At 100 TB the corpus side is the standing hash
    // index (bucketed on h, so the probe co-partitions and never
    // rescans text); the batch window is batch-sized.
    Q(
      "c16_incremental_dedup",
      (s, dir) => {
        import s.implicits._
        val h = Tables.documents(s, dir)
          .select($"doc_id", md5(Dedup.normalized($"text")).as("h"))
        val corpus = h.filter($"doc_id" % 10 =!= 9)
          .select($"h").distinct().withColumn("dc", lit(true))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"h").orderBy($"doc_id")
        h.filter($"doc_id" % 10 === 9)
          .withColumn("rn", row_number().over(w))
          .join(corpus, Seq("h"), "left")
          .select($"doc_id",
            coalesce($"dc", lit(false)).as("dup_of_corpus"),
            ($"rn" > 1).as("dup_within_batch"))
          .orderBy($"doc_id")
      },
      Some("""WITH h AS (SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS h
             |  FROM documents),
             |c AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 <> 9),
             |b AS (SELECT doc_id, h,
             |  row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
             |  FROM h WHERE doc_id % 10 = 9)
             |SELECT b.doc_id, (c.h IS NOT NULL) AS dup_of_corpus,
             |  rn > 1 AS dup_within_batch
             |FROM b LEFT JOIN c USING (h) ORDER BY doc_id""".stripMargin)),

    // Round-robin source interleaving — the fair-mixture ordering a
    // curriculum feeds the trainer: documents ranked within their
    // source by the c07 FNV order, then consumed in (round, source)
    // order so every prefix of the stream is balanced across sources.
    // One shuffle keyed on source for the within-source rank (the
    // WindowGroupLimit pushdown bounds it to the prefix need), then
    // the global prefix is a top-k, not a global sort.
    Q(
      "c17_interleave",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
          .orderBy($"hkey", $"doc_id")
        Tables.documents(s, dir)
          .select($"doc_id", $"source",
            pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
              lit(1048576L)).as("hkey"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 10)
          .select($"rn".cast("long").as("round"), $"source", $"doc_id")
          .orderBy($"round", $"source")
      },
      Some(s"""WITH h AS (SELECT doc_id, source,
              |  ((${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))}
              |    % 1048576) + 1048576) % 1048576 AS hkey
              |  FROM documents),
              |r AS (SELECT doc_id, source, row_number() OVER
              |  (PARTITION BY source ORDER BY hkey, doc_id) AS rn FROM h)
              |SELECT CAST(rn AS BIGINT) AS round, source, doc_id
              |FROM r WHERE rn <= 10 ORDER BY round, source""".stripMargin)),

    // Per-source quantile calibration (quantile normalization): a doc's
    // quality score is replaced by the global score at the same within-
    // source quantile, removing per-source scorer bias before a single
    // corpus-wide quality cutoff is applied. calibrated(d) = min global
    // score g with G(g) ≥ F_src(q_d), where both CDFs are evaluated on
    // DISTINCT score values (the windows run over score-cardinality
    // rows, not corpus rows — at 6dp quality has ≤1e6 distinct values,
    // so no corpus-scale single-partition sort exists anywhere). The
    // quantile match compares cle/ns ≤ gle/ng by integer cross-
    // multiplication — exact, no float epsilon in the semantics.
    Q(
      "c18_quantile_calibrate",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val sc = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"source",
            round(TA.qualityScore($"text", tok), 6).as("q"))
        val srcCnt = sc.groupBy($"source", $"q").agg(count(lit(1)).as("c"))
        val wSrc = Window.partitionBy($"source").orderBy($"q")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val srcTot = sc.groupBy($"source").agg(count(lit(1)).as("ns"))
        val srcCum = srcCnt
          .withColumn("cle", sum($"c").over(wSrc))
          .join(broadcast(srcTot), Seq("source"))
        val gTot = sc.agg(count(lit(1)).as("ng"))
        val wG = Window.orderBy($"qg") // distinct global scores only
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gCum = sc.groupBy($"q".as("qg")).agg(count(lit(1)).as("gc"))
          .withColumn("gle", sum($"gc").over(wG))
          .crossJoin(broadcast(gTot))
        val cal = srcCum.join(broadcast(gCum),
            $"gle" * $"ns" >= $"cle" * $"ng")
          .groupBy($"source", $"q")
          .agg(min($"qg").as("calibrated"))
        sc.join(cal, Seq("source", "q"))
          .select($"doc_id", $"source", $"q".as("quality"), $"calibrated")
          .orderBy($"doc_id")
      },
      Some(s"""WITH base AS (SELECT doc_id, source, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
              |m AS (SELECT *,
              |  ${TextSql.ratioItems}
              |  FROM base),
              |sc AS (SELECT doc_id, source,
              |  ${TextSql.qualityExpr("len(tok)")} AS q FROM m),
              |scnt AS (SELECT source, q, count(*) AS c FROM sc GROUP BY source, q),
              |stot AS (SELECT source, count(*) AS ns FROM sc GROUP BY source),
              |scum AS (SELECT scnt.source, q, sum(c) OVER (PARTITION BY scnt.source
              |    ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS cle, ns
              |  FROM scnt JOIN stot ON scnt.source = stot.source),
              |gtot AS (SELECT count(*) AS ng FROM sc),
              |gcum AS (SELECT q AS qg, sum(gc) OVER (ORDER BY qg
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gle
              |  FROM (SELECT q, count(*) AS gc FROM sc GROUP BY q)),
              |cal AS (SELECT s.source, s.q, min(g.qg) AS calibrated
              |  FROM scum s CROSS JOIN gtot JOIN gcum g
              |    ON g.gle * s.ns >= s.cle * gtot.ng
              |  GROUP BY s.source, s.q)
              |SELECT sc.doc_id, sc.source, sc.q AS quality, cal.calibrated
              |FROM sc JOIN cal ON sc.source = cal.source AND sc.q = cal.q
              |ORDER BY sc.doc_id""".stripMargin)),

    // Padding-waste report for length-bucketed batching — the training-
    // efficiency number c06's packing exists to beat: docs fall into
    // 16-token buckets (capped at 16 buckets); batching each bucket to its
    // own max length wastes (n·max − Σlen)/(n·max) of the compute.
    // Everything up to the final ratio is exact integer arithmetic, so
    // the report is partition-order-proof by construction. One narrow
    // token count + one hash agg at any corpus size.
    Q(
      "c20_padding_waste",
      (s, dir) => {
        import s.implicits._
        // Astral-plane chars are stripped BEFORE tokenizing: Java regex
        // walks UTF-16 code units (an emoji = 2 punctuation matches) while
        // DuckDB's RE2 walks code points (1 match) — pinning the count to
        // the BMP makes the two engines agree on any corpus.
        val tokRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            size(regexp_extract_all(
              regexp_replace($"text", "[\\x{10000}-\\x{10FFFF}]", ""),
              lit(tokRe), lit(0))).cast("long").as("nt"))
          .select($"doc_id", $"nt",
            least(expr("nt div 16"), lit(15L)).cast("long").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_docs"),
            max($"nt").as("max_len"),
            sum($"nt").as("sum_len"))
          // greatest(·,1): bucket 0 can be all zero-token docs; 0/0 would
          // be NaN in Spark vs an engine-dependent result in DuckDB.
          .select($"bucket", $"n_docs", $"max_len", $"sum_len",
            round(($"n_docs" * $"max_len" - $"sum_len") * 1.0 /
              greatest($"n_docs" * $"max_len", lit(1L)), 6).as("padding_frac"))
          .orderBy($"bucket")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  len(regexp_extract_all(regexp_replace(text, '[\x{10000}-\x{10FFFF}]', '', 'g'),
             |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS nt
             |  FROM documents),
             |b AS (SELECT doc_id, nt, least(nt // 16, 15) AS bucket FROM t),
             |g AS (SELECT bucket, count(*) AS n_docs, max(nt) AS max_len,
             |  CAST(sum(nt) AS BIGINT) AS sum_len FROM b GROUP BY bucket)
             |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs,
             |  CAST(max_len AS BIGINT) AS max_len, sum_len,
             |  round((n_docs * max_len - sum_len) * 1.0 /
             |    greatest(n_docs * max_len, 1), 6) AS padding_frac
             |FROM g ORDER BY bucket""".stripMargin)),

    // Sliding-window chunking over TOKENS — the sequence-construction
    // step that turns variable-length documents into fixed-size training
    // windows with overlap (window 32 tokens, stride 24, so consecutive
    // chunks share 8 tokens of context). a09_chunks slides over
    // CHARACTERS (retrieval-style passage chunks); this one is the
    // token-budgeted variant a context-window pipeline feeds to packing. Emits one row per chunk with its
    // token count and an md5 over the chunk text, pinning the exact
    // token spans. Scale shape: a narrow per-row transform + explode —
    // embarrassingly parallel, zero shuffles; chunk count is
    // ceil(n/stride)-bounded so output is linear in corpus tokens.
    Q(
      "c21_chunk_windows",
      (s, dir) => {
        import s.implicits._
        val W = 32
        val S = 24
        graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", TF.tokenize($"text").as("t"))
          .where(size($"t") > 0)
          .select($"doc_id", posexplode(expr(
            s"transform(sequence(0, (size(t)-1) div $S), i -> slice(t, i*$S+1, $W))")))
          .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
            size($"col").cast("long").as("n_tokens"),
            md5(concat_ws(" ", $"col")).as("chunk_md5"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""WITH base AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |ch AS (SELECT doc_id, unnest(list_transform(range((len(t)-1)//24 + 1),
             |    i -> struct_pack(ci := i, cs := t[i*24+1 : i*24+32]))) AS c
             |  FROM base WHERE len(t) > 0)
             |SELECT doc_id, CAST(c.ci AS BIGINT) AS chunk_idx,
             |  CAST(len(c.cs) AS BIGINT) AS n_tokens,
             |  md5(array_to_string(c.cs, ' ')) AS chunk_md5
             |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Temperature-scaled mixture weights (the multilingual rebalancing
    // rule from mBERT/XLM-R: p_l ∝ n_l^α with α=0.3) — upsamples low-
    // resource languages relative to their raw share. Reports each
    // language's raw count, temperature weight, allocation per 1M
    // sampled docs, and the implied epochs over its pool (how many
    // times a low-resource corpus repeats). One vocabulary-sized agg +
    // a broadcast scalar total: no scale risk at any corpus size.
    // Determinism: the 5 n^α terms are rounded to 9dp and summed in
    // DECIMAL so the total is partition-order-proof.
    Q(
      "c22_temperature_mixture",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.documents(s, dir)
          .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("w_raw",
            round(pow($"n_docs".cast("double"), 0.3), 9).cast("decimal(28,9)"))
        val tot = counts.agg(sum($"w_raw").as("w_tot"))
        counts.crossJoin(broadcast(tot))
          .withColumn("weight",
            round($"w_raw".cast("double") / $"w_tot".cast("double"), 6))
          .select($"lang", $"n_docs", $"weight",
            round($"w_raw".cast("double") / $"w_tot".cast("double") * 1e6, 0)
              .cast("long").as("alloc_per_m"))
          .withColumn("epochs",
            round($"alloc_per_m".cast("double") / $"n_docs", 6))
          .orderBy($"lang")
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs,
             |    CAST(round(pow(n_docs, 0.3), 9) AS DECIMAL(28,9)) AS w_raw
             |  FROM documents GROUP BY lang),
             |t AS (SELECT sum(w_raw) AS w_tot FROM c),
             |a AS (SELECT lang, n_docs,
             |    round(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE), 6) AS weight,
             |    CAST(round(CAST(w_raw AS DOUBLE) / CAST(w_tot AS DOUBLE) * 1e6, 0)
             |      AS BIGINT) AS alloc_per_m
             |  FROM c CROSS JOIN t)
             |SELECT lang, n_docs, weight, alloc_per_m,
             |  round(alloc_per_m * 1.0 / n_docs, 6) AS epochs
             |FROM a ORDER BY lang""".stripMargin)),

    // Deterministic epoch shuffle — the reproducible global data order
    // a training run needs: each epoch's order is the sort of
    // FNV(epoch ":" doc_id), so re-running the job (or re-sharding the
    // cluster) yields the IDENTICAL sequence, and each epoch is an
    // independent pseudo-random permutation (c03's split technique
    // applied to ordering). The epoch seed is hashed FIRST: as the
    // final byte it would only shift every key by the constant ±prime
    // (FNV's last step is (state XOR byte) * prime, and the epoch byte
    // flips one bit of state), leaving the permutation essentially
    // unchanged across epochs — the seed must diverge the hash state
    // before the per-doc bytes fold in (caught by PipelineGatesSpec's
    // distinct-permutation check). Emits the shuffle key itself; a
    // reader materializes positions by range-sorting on it — Spark's
    // orderBy IS the distributed range sort, so there is no global
    // window or single-task stage at any corpus size.
    Q(
      "c23_epoch_shuffle",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id", explode(sequence(lit(0), lit(1))).as("epoch"))
          .select($"doc_id", $"epoch".cast("long").as("epoch"),
            graft.functions.Fnv.fnv1a64(
              concat($"epoch".cast("string"), lit(":"),
                $"doc_id".cast("string"))).as("skey"))
          .orderBy($"epoch", $"skey", $"doc_id")
      },
      Some(s"""WITH e AS (SELECT doc_id, unnest([0, 1]) AS epoch
              |  FROM documents),
              |k AS (SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
              |  ${FnvSql.toSigned(FnvSql.ofString(
                   "(epoch::VARCHAR || ':' || doc_id::VARCHAR)"))} AS skey
              |  FROM e)
              |SELECT doc_id, epoch, skey FROM k
              |ORDER BY epoch, skey, doc_id""".stripMargin)),

    // Tokenize-then-pack, end to end: the producing step of a training-
    // data pipeline — each document's TRUE token count under the t15-
    // trained BPE tokenizer (vocabulary-sized broadcast dictionary, as
    // t20) drives c06's hash-sharded context packing at ctx=512. c06
    // packs by a whitespace proxy; this composition packs by the count
    // the trainer actually pays, and the gate checks the two
    // oracle-green stages COMPOSE (the c01 principle). Scale shape:
    // tokenizer application is a broadcast join + per-doc agg, packing
    // is one shard-partitioned window — no global state.
    Q(
      "c24_bpe_pack",
      (s, dir) => {
        import s.implicits._
        val docs = graft.Par.fanOut(Tables.documents(s, dir))
        val dict = graft.operators.Bpe.subwordDict(s,
          graft.operators.Bpe.wordFrequencies(
            docs.select(TF.tokenize($"text").as("tokens")), "tokens"),
          numMerges = 20)
        val counts = docs
          .select($"doc_id", explode(TF.tokenize($"text")).as("word"))
          .join(broadcast(dict), "word")
          .groupBy($"doc_id").agg(sum($"n_sub").cast("long").as("n_tok"))
        graft.operators.Packing.contextPack(counts, "doc_id", $"n_tok",
          ctx = 512L, shards = 8)
          .orderBy($"doc_id")
      },
      Some(s"""${TextQueries.bpeCtesSql},
              |dict AS (SELECT word, len(string_split(repr, chr(31))) AS n_sub
              |  FROM r20),
              |dw AS (SELECT doc_id,
              |  unnest(regexp_extract_all(lower(text), '[a-zA-Z]+')) AS word
              |  FROM documents),
              |pd AS (SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n_tok
              |  FROM dw JOIN dict USING (word) GROUP BY doc_id),
              |h0 AS (SELECT doc_id, n_tok AS n_tokens,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hs
              |  FROM pd),
              |sh AS (SELECT doc_id, n_tokens,
              |  CAST(((hs % 8) + 8) % 8 AS INTEGER) AS shard, hs FROM h0),
              |p AS (SELECT doc_id, shard, n_tokens,
              |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
              |    ORDER BY hs, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              |    AS start_offset
              |  FROM sh)
              |SELECT doc_id, shard, n_tokens, start_offset,
              |start_offset // 512 AS window_id
              |FROM p ORDER BY doc_id""".stripMargin)),

    // Per-source (domain) cap — the RefinedWeb/CCNet "no domain may
    // dominate the corpus" gate: keep at most N=64 docs per source,
    // chosen by deterministic FNV-hash order so the survivor set is
    // stable across runs, shards, and engines (a random cap would be
    // neither reproducible nor oracle-checkable). The kept side filters
    // rank ≤ N directly over the hash window, which Spark rewrites to
    // WindowGroupLimit: each map task keeps its local top-64 per
    // source, so no task ever sorts a whole source — the plan survives
    // a single source holding 10% of 100 TB. The per-source totals come
    // from a separate one-pass count agg joined back (broadcast-sized:
    // one row per source); dropped = n_docs − kept is arithmetic, not a
    // second scan of the losers.
    Q(
      "c25_source_cap",
      (s, dir) => {
        import s.implicits._
        val N = 64
        val h = Tables.documents(s, dir)
          .select($"doc_id", $"source", $"n_chars",
            graft.functions.Fnv.fnv1a_perm(lit(2), $"doc_id").as("hv"))
        val w = Window.partitionBy($"source").orderBy($"hv", $"doc_id")
        val kept = h.withColumn("rk", row_number().over(w))
          .filter($"rk" <= N)
          .groupBy($"source")
          .agg(count(lit(1)).as("kept"), sum($"n_chars").as("kept_chars"))
        val tot = h.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        tot.join(kept, Seq("source"))
          .select($"source", $"n_docs", $"kept",
            ($"n_docs" - $"kept").as("dropped"), $"kept_chars")
          .orderBy($"source")
      },
      Some(s"""WITH h AS (SELECT doc_id, source, n_chars,
              |  ${FnvSql.toSigned(FnvSql.perm("2", "doc_id::HUGEINT"))} AS hv
              |  FROM documents),
              |k AS (SELECT source, doc_id, n_chars FROM h
              |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 64),
              |kept AS (SELECT source, count(*) AS kept,
              |  CAST(sum(n_chars) AS BIGINT) AS kept_chars FROM k GROUP BY source),
              |tot AS (SELECT source, count(*) AS n_docs FROM h GROUP BY source)
              |SELECT t.source, n_docs, kept, n_docs - kept AS dropped, kept_chars
              |FROM tot t JOIN kept USING (source)
              |ORDER BY t.source""".stripMargin)),

    // End-to-end curation funnel: the attrition report a training-data
    // team reads before every corpus release — the FIVE standard gates
    // in pipeline order (length → language agreement → quality →
    // repetition/TTR → exact-dedup survivor), each row = docs entering
    // the stage, docs surviving it, docs it dropped. One pass computes
    // all five per-doc booleans (reusing the a02/a01/c15 operator
    // definitions, so the funnel can't drift from the gates it
    // reports on); the funnel itself is a single aggregate + stack
    // unpivot — no per-stage rescans, which is the property that
    // matters at 100 TB. The dedup gate is corpus-wide first-wins (the
    // same canonical-survivor rule as c09/c15), evaluated on all docs
    // so the report is a pure function of the corpus, not of gate
    // ordering.
    Q(
      "c26_pipeline_attrition",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val base = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang",
            size(tok).cast("long").as("ntok"),
            round(TA.qualityScore($"text", tok), 6).as("q"),
            TA.languageId($"text").as("guessed"),
            (size(array_distinct(tok)).cast("double") /
              greatest(size(tok), lit(1))).as("ttr"),
            md5(Dedup.normalized($"text")).as("h"))
        val w = Window.partitionBy($"h").orderBy($"doc_id")
        val flags = base
          .withColumn("rn", row_number().over(w))
          .select(
            ($"ntok" >= 20).as("g1"),
            ($"guessed" === $"lang").as("g2"),
            ($"q" >= 0.5).as("g3"),
            ($"ttr" >= 0.3).as("g4"),
            ($"rn" === 1).as("g5"))
        flags.agg(
            count(lit(1)).as("n0"),
            count(when($"g1", 1)).as("n1"),
            count(when($"g1" && $"g2", 1)).as("n2"),
            count(when($"g1" && $"g2" && $"g3", 1)).as("n3"),
            count(when($"g1" && $"g2" && $"g3" && $"g4", 1)).as("n4"),
            count(when($"g1" && $"g2" && $"g3" && $"g4" && $"g5", 1)).as("n5"))
          .select(expr(
            "stack(5, 1, 'length', n0, n1, 2, 'language', n1, n2, " +
              "3, 'quality', n2, n3, 4, 'repetition', n3, n4, " +
              "5, 'exact_dedup', n4, n5) AS (stage, gate, n_in, n_out)"))
          .withColumn("dropped", $"n_in" - $"n_out")
          .orderBy($"stage")
      },
      Some(s"""WITH base AS (SELECT doc_id, lang, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok,
              |  regexp_split_to_array(lower(text), '[^a-zA-Z]+') AS tk
              |  FROM documents),
              |m AS (SELECT doc_id, lang, text, tok,
              |  ${TextSql.ratioItems},
              |  len(tok) AS ntok,
              |  ${TextSql.voteItems},
              |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
              |  FROM base),
              |f AS (SELECT doc_id,
              |  ntok >= 20 AS g1,
              |  (${TextSql.guessedCase}) = lang AS g2,
              |  ${TextSql.qualityExpr()} >= 0.5 AS g3,
              |  len(list_distinct(tok)) * 1.0 / greatest(len(tok), 1) >= 0.3 AS g4,
              |  row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1 AS g5
              |  FROM m),
              |agg AS (SELECT
              |  CAST(count(*) AS BIGINT) AS n0,
              |  CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS n1,
              |  CAST(count(*) FILTER (WHERE g1 AND g2) AS BIGINT) AS n2,
              |  CAST(count(*) FILTER (WHERE g1 AND g2 AND g3) AS BIGINT) AS n3,
              |  CAST(count(*) FILTER (WHERE g1 AND g2 AND g3 AND g4) AS BIGINT) AS n4,
              |  CAST(count(*) FILTER (WHERE g1 AND g2 AND g3 AND g4 AND g5) AS BIGINT) AS n5
              |  FROM f)
              |SELECT CAST(stage AS INTEGER) AS stage, gate, n_in, n_out,
              |  n_in - n_out AS dropped FROM (
              |  SELECT 1 AS stage, 'length' AS gate, n0 AS n_in, n1 AS n_out FROM agg
              |  UNION ALL SELECT 2, 'language', n1, n2 FROM agg
              |  UNION ALL SELECT 3, 'quality', n2, n3 FROM agg
              |  UNION ALL SELECT 4, 'repetition', n3, n4 FROM agg
              |  UNION ALL SELECT 5, 'exact_dedup', n4, n5 FROM agg)
              |ORDER BY stage""".stripMargin)),

    // DoReMi-style domain reweighting (Xie et al. 2023, "Doremi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining"),
    // the one-step static approximation: each source's EXCESS loss
    // under the corpus bigram LM (a24's surprisal chain) over the
    // global mean sets its mixture weight ∝ exp(excess) — domains the
    // reference model finds hard get upweighted. (The published method
    // iterates this with a proxy-model training loop; the excess-loss
    // → exponential-weights step is the part a data engine owns.)
    // Scale shape: a24's linear LM chain plus two broadcast-sized
    // aggregations; per-doc surprisal is DECIMAL-summed per source so
    // the means — and therefore every weight — are partition-proof.
    Q(
      "c27_doremi_weights",
      (s, dir) => {
        import s.implicits._
        val pd = AnalysisQueries.lmSurprisalPerDoc(s, dir)
        val per = pd
          .join(Tables.documents(s, dir).select($"doc_id", $"source"),
            Seq("doc_id"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            round(sum($"surprisal".cast("decimal(18,6)")).cast("double") /
              count(lit(1)), 6).as("mean_surprisal"))
        val glob = pd.agg(
          round(sum($"surprisal".cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).as("gmean"))
        val ex = per.crossJoin(broadcast(glob))
          .withColumn("excess", round($"mean_surprisal" - $"gmean", 6))
          .withColumn("rw", round(exp($"excess"), 6).cast("decimal(18,6)"))
        val tot = ex.agg(sum($"rw").as("trw"))
        ex.crossJoin(broadcast(tot))
          .select($"source", $"n_docs", $"mean_surprisal", $"excess",
            round($"rw".cast("double") / $"trw".cast("double"), 6)
              .as("weight"))
          .orderBy($"source")
      },
      Some(s"""WITH ${AnalysisQueries.lmSurprisalCtes},
              |ds AS (SELECT doc_id, source FROM documents),
              |per AS (SELECT source, count(*) AS n_docs,
              |  round(CAST(sum(CAST(surprisal AS DECIMAL(18,6))) AS DOUBLE)
              |    / count(*), 6) AS mean_surprisal
              |  FROM pd JOIN ds USING (doc_id) GROUP BY source),
              |gl AS (SELECT round(CAST(sum(CAST(surprisal AS DECIMAL(18,6)))
              |    AS DOUBLE) / count(*), 6) AS gmean FROM pd),
              |ex AS (SELECT source, n_docs, mean_surprisal,
              |  round(mean_surprisal - gmean, 6) AS excess,
              |  CAST(round(exp(round(mean_surprisal - gmean, 6)), 6)
              |    AS DECIMAL(18,6)) AS rw
              |  FROM per CROSS JOIN gl),
              |tt AS (SELECT sum(rw) AS trw FROM ex)
              |SELECT source, n_docs, mean_surprisal, excess,
              |  round(CAST(rw AS DOUBLE) / CAST(trw AS DOUBLE), 6) AS weight
              |FROM ex CROSS JOIN tt ORDER BY source""".stripMargin)),

    // Greedy no-split sequence packing (SentenceChunks.noSplitPack):
    // whole documents packed into fixed-budget training sequences with
    // no document ever cut — the cross-doc-contamination-safe
    // alternative to c06/c24's stream cutting, whose padding cost c20
    // measures. Hash shards pack independently inside one HOF fold;
    // the oracle replays the greedy recurrence as a recursive CTE over
    // dense per-shard hash-order positions.
    Q(
      "c28_nosplit_pack",
      (s, dir) => {
        import s.implicits._
        graft.operators.SentenceChunks.noSplitPack(
            graft.Par.fanOut(Tables.documents(s, dir)),
            TA.wsTokenCount($"text"), budget = 256L, shards = 8)
          .orderBy($"doc_id")
      },
      // b0 MATERIALIZED + the fold hoisted to ONE hu column: the
      // recursive rec CTE re-references pos once per packing step, and
      // un-materialized that re-evaluated the whole FNV fold chain per
      // step (sf0.1: 115 s -> 5.5 s, identical rows)
      Some(s"""WITH RECURSIVE b0 AS MATERIALIZED (SELECT doc_id,
             |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
             |    AS nt,
             |  ${FnvSql.ofString("doc_id::VARCHAR")} AS hu
             |  FROM documents),
             |b AS (SELECT doc_id, nt,
             |  ${FnvSql.toSigned("hu")} AS hs
             |  FROM b0),
             |sd AS (SELECT doc_id, nt, hs,
             |  CAST((CASE WHEN hs < 0 THEN hs + 18446744073709551616::HUGEINT
             |    ELSE hs::HUGEINT END % 8) AS INTEGER) AS shard
             |  FROM b),
             |pos AS MATERIALIZED (SELECT doc_id, nt, shard,
             |  CAST(row_number() OVER (PARTITION BY shard
             |    ORDER BY hs, doc_id) - 1 AS INTEGER) AS pos
             |  FROM sd),
             |rec AS (
             |  SELECT shard, pos, doc_id, nt, 0::BIGINT AS seq, nt AS used
             |  FROM pos WHERE pos = 0
             |  UNION ALL
             |  SELECT p.shard, p.pos, p.doc_id, p.nt,
             |    CASE WHEN c.used + p.nt > 256 THEN c.seq + 1 ELSE c.seq END,
             |    CASE WHEN c.used + p.nt > 256 THEN p.nt
             |      ELSE c.used + p.nt END
             |  FROM rec c JOIN pos p
             |    ON p.shard = c.shard AND p.pos = c.pos + 1)
             |SELECT doc_id, shard, pos, seq AS seq_id, nt
             |FROM rec ORDER BY doc_id""".stripMargin)),

    // Corpus snapshot diff — the dataset-versioning audit run between
    // two corpus releases: added / removed / content-changed /
    // unchanged document counts and character deltas per source,
    // from ONE full-outer join on doc_id with content-hash compare.
    // Snapshots derive deterministically from the documents table
    // (A drops doc_id%10==9, B drops %10==0 and rewrites %7==3), so
    // both engines build identical releases. At 100 TB this is a
    // hash-bucketed join of two manifests carrying (id, md5, nchars)
    // only — document text never crosses the wire.
    Q(
      "c29_snapshot_diff",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir)
          .select($"doc_id", $"source", $"text")
        val snapA = d.filter($"doc_id" % 10 =!= 9)
          .select($"doc_id", $"source", md5($"text").as("ha"),
            length($"text").cast("long").as("ca"))
        val snapB = d.filter($"doc_id" % 10 =!= 0)
          .select($"doc_id", $"source",
            when($"doc_id" % 7 === 3, concat($"text", lit(" [rev2]")))
              .otherwise($"text").as("t2"))
          .select($"doc_id", $"source", md5($"t2").as("hb"),
            length($"t2").cast("long").as("cb"))
        snapA.join(snapB, Seq("doc_id", "source"), "full_outer")
          .groupBy($"source")
          .agg(
            count(when($"ha".isNull, 1)).as("n_added"),
            count(when($"hb".isNull, 1)).as("n_removed"),
            count(when($"ha".isNotNull && $"hb".isNotNull &&
              $"ha" =!= $"hb", 1)).as("n_changed"),
            count(when($"ha" === $"hb", 1)).as("n_unchanged"),
            coalesce(sum(when($"ha".isNull, $"cb")), lit(0L))
              .as("chars_added"),
            coalesce(sum(when($"hb".isNull, $"ca")), lit(0L))
              .as("chars_removed"))
          .orderBy($"source")
      },
      Some("""WITH a AS (SELECT doc_id, source, md5(text) AS ha,
             |  CAST(length(text) AS BIGINT) AS ca
             |  FROM documents WHERE doc_id % 10 <> 9),
             |b AS (SELECT doc_id, source, md5(t2) AS hb,
             |  CAST(length(t2) AS BIGINT) AS cb
             |  FROM (SELECT doc_id, source,
             |    CASE WHEN doc_id % 7 = 3 THEN text || ' [rev2]'
             |      ELSE text END AS t2
             |    FROM documents WHERE doc_id % 10 <> 0)),
             |j AS (SELECT coalesce(a.source, b.source) AS source,
             |  ha, hb, ca, cb
             |  FROM a FULL OUTER JOIN b
             |    ON a.doc_id = b.doc_id AND a.source = b.source)
             |SELECT source,
             |  count(CASE WHEN ha IS NULL THEN 1 END) AS n_added,
             |  count(CASE WHEN hb IS NULL THEN 1 END) AS n_removed,
             |  count(CASE WHEN ha IS NOT NULL AND hb IS NOT NULL
             |    AND ha <> hb THEN 1 END) AS n_changed,
             |  count(CASE WHEN ha = hb THEN 1 END) AS n_unchanged,
             |  CAST(coalesce(sum(CASE WHEN ha IS NULL THEN cb END), 0)
             |    AS BIGINT) AS chars_added,
             |  CAST(coalesce(sum(CASE WHEN hb IS NULL THEN ca END), 0)
             |    AS BIGINT) AS chars_removed
             |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // Removal ledger — the per-document AUDIT TRAIL of the c01
    // pipeline: every doc gets its decision with a reason code in
    // fixed precedence (quality fail > language mismatch > exact-dup
    // loser > kept). Curation teams ship this ledger with a corpus
    // release so every exclusion is attributable; it is one scan +
    // one hash-keyed keeper aggregate joined back (no second pass
    // over text). The oracle rides the SAME CTE fragments as
    // c01/c02, so the gate proves the ledger agrees with the corpus
    // the pipeline actually kept.
    Q(
      "c30_removal_ledger",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val scored = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang",
            TA.wsTokenCount($"text").cast("long").as("ws_tokens"),
            round(TA.qualityScore($"text", tok), 6).as("quality"),
            TA.languageId($"text").as("guessed"),
            md5(Dedup.normalized($"text")).as("content_hash"))
        val keepers = scored
          .filter($"quality" >= MinQuality && $"guessed" === $"lang")
          .groupBy($"content_hash").agg(min($"doc_id").as("keeper"))
        scored.join(keepers, Seq("content_hash"), "left")
          .select($"doc_id",
            when($"quality" < MinQuality, "quality")
              .when($"guessed" =!= $"lang", "lang_mismatch")
              .when($"doc_id" =!= $"keeper", "exact_dup")
              .otherwise("kept").as("reason"),
            $"quality", $"ws_tokens")
          .orderBy($"doc_id")
      },
      Some(s"""WITH $curatedSql,
              |sc AS (SELECT doc_id, lang, quality, ws_tokens, guessed,
              |  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
              |    AS content_hash
              |  FROM g),
              |k AS (SELECT content_hash, min(doc_id) AS keeper FROM sc
              |  WHERE quality >= $MinQuality AND guessed = lang
              |  GROUP BY content_hash)
              |SELECT doc_id,
              |  CASE WHEN quality < $MinQuality THEN 'quality'
              |    WHEN guessed <> lang THEN 'lang_mismatch'
              |    WHEN doc_id <> keeper THEN 'exact_dup'
              |    ELSE 'kept' END AS reason,
              |  quality, ws_tokens
              |FROM sc LEFT JOIN k USING (content_hash)
              |ORDER BY doc_id""".stripMargin)),

    // Split-leakage REPAIR — the fix for what c14 only audits: every
    // near-dup pair crossing split boundaries drops its lower-priority
    // member (train > val > test), i.e. the EVAL-side copy — the
    // train-set-preserving policy (training data is immutable once a
    // run is budgeted; eval sets shrink slightly instead). This is the
    // OPPOSITE of the Lee et al. 2022 decontamination convention (drop
    // the train member so held-out sets stay intact) — that
    // conventional rule ships as c35_split_repair_droptrain below, so
    // a pipeline picks which side of the leak to sacrifice. One
    // victims set from the same LSH pair table, one anti-membership
    // count per split. The oracle rides c14's full minhash chain plus
    // the victim rule.
    Q(
      "c31_split_repair",
      (s, dir) => {
        import s.implicits._
        def bucketOf(c: org.apache.spark.sql.Column) =
          pmod(graft.functions.Fnv.fnv1a64(c.cast("string")), lit(100L))
        def splitOf(c: org.apache.spark.sql.Column) = {
          val b = bucketOf(c)
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
        }
        def prioOf(c: org.apache.spark.sql.Column) = {
          val b = bucketOf(c)
          when(b < 80, 3).when(b < 90, 2).otherwise(1)
        }
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val leaks = Dedup.minhashNearDuplicates(toks, shingleN = 3,
            numHashes = 32, bands = 8, threshold = 0.3)
          .filter(splitOf($"a") =!= splitOf($"b"))
        val victims = leaks
          .select(when(prioOf($"a") < prioOf($"b"), $"a").otherwise($"b")
            .as("doc_id"))
          .distinct()
          .withColumn("dropped", lit(1L))
        Tables.documents(s, dir)
          .select($"doc_id", splitOf($"doc_id").as("split"))
          .join(victims, Seq("doc_id"), "left")
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum($"dropped"), lit(0L)).as("n_dropped"),
            (count(lit(1)) - coalesce(sum($"dropped"), lit(0L)))
              .as("n_kept"))
          .orderBy($"split")
      },
      Some {
        def bucketOf(e: String) =
          s"(((${FnvSql.toSigned(FnvSql.ofString(e))} % 100) + 100) % 100)"
        s"""WITH ${DedupQueries.minhashPairCtes},
           |f AS (SELECT a, b,
           |  ${bucketOf("(a::VARCHAR)")} AS ba,
           |  ${bucketOf("(b::VARCHAR)")} AS bb
           |  FROM jac WHERE j >= 0.3),
           |pr AS (SELECT a, b,
           |  CASE WHEN ba < 80 THEN 3 WHEN ba < 90 THEN 2 ELSE 1 END AS pa,
           |  CASE WHEN bb < 80 THEN 3 WHEN bb < 90 THEN 2 ELSE 1 END AS pb
           |  FROM f),
           |v AS (SELECT DISTINCT CASE WHEN pa < pb THEN a ELSE b END
           |  AS doc_id FROM pr WHERE pa <> pb),
           |ds AS (SELECT doc_id,
           |  CASE WHEN ${bucketOf("(doc_id::VARCHAR)")} < 80 THEN 'train'
           |    WHEN ${bucketOf("(doc_id::VARCHAR)")} < 90 THEN 'val'
           |    ELSE 'test' END AS split
           |  FROM documents)
           |SELECT split, count(*) AS n_docs,
           |  CAST(count(v.doc_id) AS BIGINT) AS n_dropped,
           |  CAST(count(*) - count(v.doc_id) AS BIGINT) AS n_kept
           |FROM ds LEFT JOIN v USING (doc_id)
           |GROUP BY split ORDER BY split""".stripMargin
      }),

    // The CONVENTIONAL decontamination rule (Lee et al. 2022 §5;
    // GPT-3/PaLM-style eval protection): for every cross-split
    // near-dup pair, drop the LESS-protected member — the train copy
    // of a train↔eval leak (and the val copy of a val↔test leak) — so
    // held-out sets stay intact and benchmark numbers stay honest.
    // Identical LSH pair table and plan shape as c31; only the victim
    // CASE flips (higher split priority = victim).
    Q(
      "c35_split_repair_droptrain",
      (s, dir) => {
        import s.implicits._
        def bucketOf(c: org.apache.spark.sql.Column) =
          pmod(graft.functions.Fnv.fnv1a64(c.cast("string")), lit(100L))
        def splitOf(c: org.apache.spark.sql.Column) = {
          val b = bucketOf(c)
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
        }
        def prioOf(c: org.apache.spark.sql.Column) = {
          val b = bucketOf(c)
          when(b < 80, 3).when(b < 90, 2).otherwise(1)
        }
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val leaks = Dedup.minhashNearDuplicates(toks, shingleN = 3,
            numHashes = 32, bands = 8, threshold = 0.3)
          .filter(splitOf($"a") =!= splitOf($"b"))
        val victims = leaks
          .select(when(prioOf($"a") > prioOf($"b"), $"a").otherwise($"b")
            .as("doc_id"))
          .distinct()
          .withColumn("dropped", lit(1L))
        Tables.documents(s, dir)
          .select($"doc_id", splitOf($"doc_id").as("split"))
          .join(victims, Seq("doc_id"), "left")
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum($"dropped"), lit(0L)).as("n_dropped"),
            (count(lit(1)) - coalesce(sum($"dropped"), lit(0L)))
              .as("n_kept"))
          .orderBy($"split")
      },
      Some {
        def bucketOf(e: String) =
          s"(((${FnvSql.toSigned(FnvSql.ofString(e))} % 100) + 100) % 100)"
        s"""WITH ${DedupQueries.minhashPairCtes},
           |f AS (SELECT a, b,
           |  ${bucketOf("(a::VARCHAR)")} AS ba,
           |  ${bucketOf("(b::VARCHAR)")} AS bb
           |  FROM jac WHERE j >= 0.3),
           |pr AS (SELECT a, b,
           |  CASE WHEN ba < 80 THEN 3 WHEN ba < 90 THEN 2 ELSE 1 END AS pa,
           |  CASE WHEN bb < 80 THEN 3 WHEN bb < 90 THEN 2 ELSE 1 END AS pb
           |  FROM f),
           |v AS (SELECT DISTINCT CASE WHEN pa > pb THEN a ELSE b END
           |  AS doc_id FROM pr WHERE pa <> pb),
           |ds AS (SELECT doc_id,
           |  CASE WHEN ${bucketOf("(doc_id::VARCHAR)")} < 80 THEN 'train'
           |    WHEN ${bucketOf("(doc_id::VARCHAR)")} < 90 THEN 'val'
           |    ELSE 'test' END AS split
           |  FROM documents)
           |SELECT split, count(*) AS n_docs,
           |  CAST(count(v.doc_id) AS BIGINT) AS n_dropped,
           |  CAST(count(*) - count(v.doc_id) AS BIGINT) AS n_kept
           |FROM ds LEFT JOIN v USING (doc_id)
           |GROUP BY split ORDER BY split""".stripMargin
      }),

    // DSIR importance RESAMPLING (c32) — a26's weights put to work:
    // Gumbel-top-k selection ∝ exp(importance), with the "randomness"
    // the deterministic FNV low-20-bit uniform both engines replay
    // (c12's recipe). log10 weights are rescaled by ln(10) so the
    // softmax base matches the Gumbel's natural log — selection is
    // exactly ∝ the importance weight. Global top-50 plans as
    // TakeOrderedAndProject; the weight chain is a26's linear LM.
    Q(
      "c32_dsir_resample",
      (s, dir) => {
        import s.implicits._
        val words = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"lang", explode(TF.tokenize($"text")).as("w"))
        val src = words.groupBy($"w").agg(count(lit(1)).as("cs"))
        val tgt = words.where($"lang" === "en")
          .groupBy($"w").agg(count(lit(1)).as("ct"))
        val totals = src.agg(sum($"cs").as("ns"), count(lit(1)).as("v"))
        val tTotal = tgt.agg(coalesce(sum($"ct"), lit(0L)).as("nt"))
        val lm = src.join(tgt, Seq("w"), "left")
          .select($"w", $"cs", coalesce($"ct", lit(0L)).as("ct"))
          .crossJoin(broadcast(totals)).crossJoin(broadcast(tTotal))
          .select($"w", round(log10(
            (($"ct" + lit(1.0)) / ($"nt" + $"v")) /
              (($"cs" + lit(1.0)) / ($"ns" + $"v"))), 6)
            .cast("decimal(18,6)").as("llr"))
        val perDoc = words
          .join(broadcast(lm), Seq("w"))
          .groupBy($"doc_id")
          .agg(round(sum($"llr").cast("double"), 6).as("log_weight"))
        val u = (pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
          lit(1048576L)) + 1).cast("double") / 1048576.0
        val key = round($"log_weight" * 2.302585092994046 +
          (-log(-log(u))), 9)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy($"gkey".desc, $"doc_id")
        perDoc.withColumn("gkey", key)
          .orderBy($"gkey".desc, $"doc_id").limit(50)
          .withColumn("rn", row_number().over(w))
          .select($"rn", $"doc_id", $"log_weight", $"gkey")
          .orderBy($"rn")
      },
      Some(s"""WITH base AS (SELECT doc_id, lang,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS t FROM documents),
             |words AS (SELECT doc_id, lang, unnest(t) AS w FROM base),
             |src AS (SELECT w, count(*) AS cs FROM words GROUP BY w),
             |tgt AS (SELECT w, count(*) AS ct FROM words
             |  WHERE lang = 'en' GROUP BY w),
             |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS ns, count(*) AS v
             |  FROM src),
             |tt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS nt
             |  FROM tgt),
             |lm AS (SELECT w,
             |    CAST(round(log10(
             |      ((coalesce(ct, 0) + 1.0) / (nt + v)) /
             |      ((cs + 1.0) / (ns + v))), 6) AS DECIMAL(18,6)) AS llr
             |  FROM src LEFT JOIN tgt USING (w) CROSS JOIN tot CROSS JOIN tt),
             |pd AS (SELECT doc_id,
             |    round(CAST(sum(llr) AS DOUBLE), 6) AS log_weight
             |  FROM words JOIN lm USING (w) GROUP BY doc_id),
             |g AS (SELECT doc_id, log_weight,
             |  round(log_weight * 2.302585092994046 +
             |    (-ln(-ln(((${FnvSql.ofString("(doc_id::VARCHAR)")})
             |      % 1048576 + 1)::DOUBLE / 1048576.0))), 9) AS gkey
             |  FROM pd),
             |r AS (SELECT *, row_number() OVER
             |  (ORDER BY gkey DESC, doc_id) AS rn FROM g)
             |SELECT CAST(rn AS INTEGER) AS rn, doc_id, log_weight, gkey
             |FROM r WHERE rn <= 50 ORDER BY rn""".stripMargin)),

    // Packing budget sweep (c33) — c06's stream-cut packing costed at
    // three context budgets without running the pack: under stream
    // cutting only each shard's LAST sequence pads, so sequences and
    // waste derive from the 8 per-shard token totals alone. This is
    // the budget-selection table read next to c20's per-bucket waste
    // report; shards match c06's FNV assignment exactly.
    Q(
      "c33_packing_budget_sweep",
      (s, dir) => {
        import s.implicits._
        val sh = graft.Par.fanOut(Tables.documents(s, dir))
          .select(pmod(graft.functions.Fnv.fnv1a64(
            $"doc_id".cast("string")), lit(8L)).cast("int").as("shard"),
            TA.wsTokenCount($"text").cast("long").as("nt"))
          .groupBy($"shard").agg(sum($"nt").as("tot"))
        val budgets = s.createDataFrame(
            Seq(512L, 2048L, 8192L).map(Tuple1(_))).toDF("ctx")
        broadcast(budgets).join(sh)
          .groupBy($"ctx")
          .agg(sum(ceil($"tot" * lit(1.0) / $"ctx").cast("long"))
            .as("n_seqs"),
            sum($"tot").as("total_tokens"))
          .select($"ctx", $"n_seqs", $"total_tokens",
            ($"n_seqs" * $"ctx" - $"total_tokens").as("padding"),
            round(($"n_seqs" * $"ctx" - $"total_tokens") * 1.0 /
              ($"n_seqs" * $"ctx"), 6).as("waste_frac"))
          .orderBy($"ctx")
      },
      Some(s"""WITH h0 AS (SELECT doc_id,
              |  CAST(len(regexp_split_to_array(trim(text), '\\s+'))
              |    AS BIGINT) AS nt,
              |  ${FnvSql.toSigned(FnvSql.ofString("(doc_id::VARCHAR)"))} AS hs
              |  FROM documents),
              |sh AS (SELECT CAST(((hs % 8) + 8) % 8 AS INTEGER) AS shard,
              |  CAST(sum(nt) AS BIGINT) AS tot
              |  FROM h0 GROUP BY 1),
              |b AS (SELECT unnest([512, 2048, 8192]) AS ctx)
              |SELECT CAST(b.ctx AS BIGINT) AS ctx,
              |  CAST(sum(CAST(ceil(sh.tot * 1.0 / b.ctx) AS BIGINT))
              |    AS BIGINT) AS n_seqs,
              |  CAST(sum(sh.tot) AS BIGINT) AS total_tokens,
              |  CAST(sum(CAST(ceil(sh.tot * 1.0 / b.ctx) AS BIGINT))
              |    * b.ctx - sum(sh.tot) AS BIGINT) AS padding,
              |  round((sum(CAST(ceil(sh.tot * 1.0 / b.ctx) AS BIGINT))
              |    * b.ctx - sum(sh.tot)) * 1.0 /
              |    (sum(CAST(ceil(sh.tot * 1.0 / b.ctx) AS BIGINT))
              |      * b.ctx), 6) AS waste_frac
              |FROM b CROSS JOIN sh
              |GROUP BY b.ctx ORDER BY ctx""".stripMargin)),

    // Dedup-then-pack composition (c34) — the two heavy pipeline
    // stages END TO END: d20's exact-substring cut rewrites the
    // corpus, the cleaned texts are re-tokenized, and the packing cost
    // at a 2048-token context is computed from the cleaned shard
    // totals (c33's math) — one row reporting how many tokens dedup
    // reclaimed and what the packed corpus costs after. The oracle
    // nests the full d20 replay as a CTE and composes the counting on
    // top, so the gate proves the STAGES COMPOSE.
    Q(
      "c34_dedup_pack_pipeline",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir).select($"doc_id", $"text")
        val clean = Dedup.removeRepeatedSpans(docs, "doc_id", "text",
            k = 40)
          .select($"id".as("doc_id"), $"clean_text")
        val before = docs.agg(
          sum(TA.wsTokenCount($"text").cast("long")).as("before_tokens"))
        val sh = clean.select(
            pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
              lit(8L)).cast("int").as("shard"),
            TA.wsTokenCount($"clean_text").cast("long").as("nt"))
          .groupBy($"shard").agg(sum($"nt").as("tot"))
        val after = sh.agg(
          sum($"tot").as("after_tokens"),
          sum(ceil($"tot" * lit(1.0) / 2048).cast("long")).as("n_seqs"))
        broadcast(before).crossJoin(after)
          .select($"before_tokens", $"after_tokens",
            ($"before_tokens" - $"after_tokens").as("tokens_removed"),
            $"n_seqs",
            ($"n_seqs" * 2048 - $"after_tokens").as("padding"),
            round(($"n_seqs" * 2048 - $"after_tokens") * 1.0 /
              ($"n_seqs" * 2048), 6).as("waste_frac"))
      },
      Some(s"""WITH cleaned AS (${DedupQueries.spanRemovalOracleSql}),
              |bt AS (SELECT CAST(sum(
              |  len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
              |  AS before_tokens FROM documents),
              |sh AS (SELECT
              |  CAST(((${FnvSql.toSigned(FnvSql.ofString(
                   "(doc_id::VARCHAR)"))} % 8) + 8) % 8 AS INTEGER) AS shard,
              |  CAST(sum(len(regexp_split_to_array(trim(clean_text),
              |    '\\s+'))) AS BIGINT) AS tot
              |  FROM cleaned GROUP BY 1),
              |aft AS (SELECT CAST(sum(tot) AS BIGINT) AS after_tokens,
              |  CAST(sum(CAST(ceil(tot * 1.0 / 2048) AS BIGINT)) AS BIGINT)
              |    AS n_seqs FROM sh)
              |SELECT bt.before_tokens, aft.after_tokens,
              |  bt.before_tokens - aft.after_tokens AS tokens_removed,
              |  aft.n_seqs,
              |  aft.n_seqs * 2048 - aft.after_tokens AS padding,
              |  round((aft.n_seqs * 2048 - aft.after_tokens) * 1.0 /
              |    (aft.n_seqs * 2048), 6) AS waste_frac
              |FROM bt CROSS JOIN aft""".stripMargin)),

    // THREE-stage end-to-end curation pipeline, verified as one hash:
    // quality gate (c26's g1∧g3: ≥20 tokens AND composite score ≥ 0.5)
    // → MinHash-LSH NEAR-dup removal over the survivors (keep-first:
    // drop the larger id of every verified pair with Jaccard ≥ 0.8 —
    // where c26's g5 only catches EXACT hashes and c34 only cuts
    // repeated spans) → fixed-budget packing summary. The oracle nests
    // the full banded-minhash pair replay over the FILTERED set
    // (minhashPairCtesFrom), so the gate proves the stages compose:
    // the dedup stage genuinely sees only quality survivors.
    // Scale shape: stage 1 is one narrow scan; stage 2 is d04's banded
    // LSH (bucket-capped, candidates only); stage 3 is one hash agg.
    // At 100 TB each stage boundary would be a checkpointed table —
    // here the lineage stays lazy and the quality scan replays 3×
    // (cheaper than materializing corpus+text at gate scale).
    // Oracle note: qdocs is deliberately NOT MATERIALIZED — unlike the
    // multiply-referenced pair CTEs (where materialization prevents
    // 2^rounds re-evaluation), a materialized corpus-text CTE feeds the
    // downstream shingle chain through a serial CTE scan and the sig
    // stage went 8 s → 55 s at sf0.001; re-inlining the cheap quality
    // filter per reference keeps the chain parallel.
    Q(
      "c36_quality_dedup_pack",
      (s, dir) => {
        import s.implicits._
        val tok = TF.tokenize($"text")
        val scored = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id", $"text",
            size(tok).cast("long").as("ntok"),
            round(TA.qualityScore($"text", tok), 6).as("q"))
        val qdocs = scored.filter($"ntok" >= 20L && $"q" >= 0.5)
          .select($"doc_id", $"text")
        val toks = qdocs
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val dropped = Dedup.minhashNearDuplicates(toks, shingleN = 3,
            numHashes = 32, bands = 8, threshold = 0.8)
          .select($"b".as("doc_id")).distinct()
        val kept = qdocs.join(dropped, Seq("doc_id"), "left_anti")
        val sh = kept.select(
            pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
              lit(8L)).cast("int").as("shard"),
            TA.wsTokenCount($"text").cast("long").as("nt"))
          .groupBy($"shard").agg(sum($"nt").as("tot"))
        val packed = sh.agg(sum($"tot").as("tokens_packed"),
          sum(ceil($"tot" * lit(1.0) / 2048).cast("long")).as("n_seqs"))
        val nRaw = Tables.documents(s, dir).agg(count(lit(1)).as("n_raw"))
        val nQ = qdocs.agg(count(lit(1)).as("n_quality"))
        val nK = kept.agg(count(lit(1)).as("n_unique"))
        broadcast(nRaw).crossJoin(broadcast(nQ)).crossJoin(broadcast(nK))
          .crossJoin(packed)
          .select($"n_raw", $"n_quality", $"n_unique",
            $"tokens_packed", $"n_seqs",
            ($"n_seqs" * 2048 - $"tokens_packed").as("padding"),
            round(($"n_seqs" * 2048 - $"tokens_packed") * 1.0 /
              ($"n_seqs" * 2048), 6).as("waste_frac"))
      },
      Some(s"""WITH qbase AS (SELECT doc_id, text,
              |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok
              |  FROM documents),
              |qm AS (SELECT doc_id, text, len(tok) AS ntok,
              |  ${TextSql.ratioItems}
              |  FROM qbase),
              |qdocs AS (SELECT doc_id, text FROM qm
              |  WHERE ntok >= 20 AND ${TextSql.qualityExpr()} >= 0.5),
              |${DedupQueries.minhashPairCtesFrom("qdocs")},
              |drp AS (SELECT DISTINCT b AS doc_id FROM jac WHERE j >= 0.8),
              |kept AS (SELECT q.doc_id, q.text FROM qdocs q
              |  WHERE NOT EXISTS (SELECT 1 FROM drp WHERE drp.doc_id = q.doc_id)),
              |shd AS (SELECT
              |  CAST(((${FnvSql.toSigned(FnvSql.ofString(
                   "(doc_id::VARCHAR)"))} % 8) + 8) % 8 AS INTEGER) AS shard,
              |  CAST(sum(len(regexp_split_to_array(trim(text),
              |    '\\s+'))) AS BIGINT) AS tot
              |  FROM kept GROUP BY 1),
              |pck AS (SELECT CAST(sum(tot) AS BIGINT) AS tokens_packed,
              |  CAST(sum(CAST(ceil(tot * 1.0 / 2048) AS BIGINT)) AS BIGINT)
              |    AS n_seqs FROM shd),
              |cnt AS (SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_raw,
              |  (SELECT CAST(count(*) AS BIGINT) FROM qdocs) AS n_quality,
              |  (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_unique)
              |SELECT cnt.n_raw, cnt.n_quality, cnt.n_unique,
              |  pck.tokens_packed, pck.n_seqs,
              |  pck.n_seqs * 2048 - pck.tokens_packed AS padding,
              |  round((pck.n_seqs * 2048 - pck.tokens_packed) * 1.0 /
              |    (pck.n_seqs * 2048), 6) AS waste_frac
              |FROM cnt CROSS JOIN pck""".stripMargin)),

    // Length-bucketed batching sweep ("smart batching", the dynamic
    // batching trick every embedding/finetune loader uses): pad-to-max
    // batches of 32 docs waste tokens proportional to within-batch
    // length VARIANCE; pre-sorting into B length buckets shrinks that
    // variance, and this query measures the waste curve for
    // B ∈ {1, 2, 4, 8} so a loader can pick its bucket count from
    // data. Batches form per (bucket, shard) — the shard key keeps the
    // rank window's parallelism at B×16 writer tasks, exactly how a
    // distributed loader batches per task; bucket boundaries are
    // VALUE-range (broadcast min/max), not global quantiles, so no
    // global sort exists anywhere. Waste per batch =
    // count·max(len) − sum(len) (the last partial batch pads to its
    // own max, not the full 32).
    Q(
      "c37_length_buckets",
      (s, dir) => {
        import s.implicits._
        val base = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            TA.wsTokenCount($"text").cast("long").as("nt"),
            pmod(graft.functions.Fnv.fnv1a64($"doc_id".cast("string")),
              lit(16L)).cast("int").as("shard"))
        val bounds = broadcast(base.agg(min($"nt").as("lo"),
          (max($"nt") - min($"nt") + 1L).as("span")))
        val bs = s.createDataFrame(Seq(1, 2, 4, 8).map(Tuple1(_)))
          .toDF("n_buckets")
        val bucketed = base.crossJoin(bounds)
          .crossJoin(broadcast(bs))
          .select($"n_buckets", $"shard", $"doc_id", $"nt",
            expr("cast(((nt - lo) * n_buckets) div span as int)").as("bucket"))
        val w = Window.partitionBy($"n_buckets", $"bucket", $"shard")
          .orderBy($"nt", $"doc_id")
        val batches = bucketed
          .withColumn("batch",
            ((row_number().over(w) - 1) / lit(32)).cast("int"))
          .groupBy($"n_buckets", $"bucket", $"shard", $"batch")
          .agg(count(lit(1)).as("c"), max($"nt").as("mx"),
            sum($"nt").as("tk"))
        batches.groupBy($"n_buckets")
          .agg(count(lit(1)).as("n_batches"),
            sum($"c" * $"mx").as("padded_tokens"),
            sum($"tk").as("real_tokens"))
          .select($"n_buckets", $"n_batches", $"padded_tokens",
            $"real_tokens",
            round(($"padded_tokens" - $"real_tokens") * 1.0 /
              $"padded_tokens", 6).as("waste_frac"))
          .orderBy($"n_buckets")
      },
      Some(s"""WITH base AS (SELECT doc_id,
              |  CAST(len(regexp_split_to_array(trim(text), '\\s+'))
              |    AS BIGINT) AS nt,
              |  CAST(((${FnvSql.toSigned(FnvSql.ofString(
                   "(doc_id::VARCHAR)"))} % 16) + 16) % 16 AS INTEGER)
              |    AS shard
              |  FROM documents),
              |bounds AS (SELECT min(nt) AS lo,
              |  max(nt) - min(nt) + 1 AS span FROM base),
              |bs AS (SELECT unnest([1, 2, 4, 8]) AS n_buckets),
              |bk AS (SELECT n_buckets, shard, doc_id, nt,
              |  CAST((nt - lo) * n_buckets // span AS INTEGER) AS bucket
              |  FROM base CROSS JOIN bounds CROSS JOIN bs),
              |bt AS (SELECT n_buckets, bucket, shard,
              |  (row_number() OVER (PARTITION BY n_buckets, bucket, shard
              |    ORDER BY nt, doc_id) - 1) // 32 AS batch, nt
              |  FROM bk),
              |agg AS (SELECT n_buckets, bucket, shard, batch,
              |  count(*) AS c, max(nt) AS mx, sum(nt) AS tk
              |  FROM bt GROUP BY 1, 2, 3, 4)
              |SELECT CAST(n_buckets AS INTEGER) AS n_buckets,
              |  count(*) AS n_batches,
              |  CAST(sum(c * mx) AS BIGINT) AS padded_tokens,
              |  CAST(sum(tk) AS BIGINT) AS real_tokens,
              |  round((sum(c * mx) - sum(tk)) * 1.0 / sum(c * mx), 6)
              |    AS waste_frac
              |FROM agg GROUP BY 1 ORDER BY n_buckets""".stripMargin)),

    // Water-filling token-budget allocation across sources: given a
    // total budget T (here half the corpus), raise one common level L
    // and give each source min(available, L) — the max-entropy mix
    // subject to availability, the closed-form answer to "spread my
    // token budget as evenly as sources allow". Small sources are
    // taken whole (saturated); the rest share the remainder equally.
    // The level solves sum(min(a_i, L)) = T: sort sources ascending by
    // availability, and for j saturated sources L_j = (T − c_j)/(n−j)
    // — the valid j is the largest with a_j ≤ L_j (prefix-sum window
    // + one argmax, no iteration). Everything after the per-source
    // token aggregate is source-count-sized (broadcast scale).
    Q(
      "c38_water_filling",
      (s, dir) => {
        import s.implicits._
        val avail = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"source", TA.wsTokenCount($"text").cast("long").as("nt"))
          .groupBy($"source").agg(sum($"nt").as("avail"))
        val tot = avail.agg(sum($"avail").as("all_tokens"),
          count(lit(1)).as("n"))
        val wSort = Window.orderBy($"avail", $"source")
        val ranked = avail.crossJoin(broadcast(tot))
          .withColumn("t", expr("all_tokens div 2"))
          .withColumn("j", row_number().over(wSort))
          .withColumn("cj", sum($"avail").over(
            wSort.rowsBetween(Window.unboundedPreceding, 0)))
        // candidate level at row j saturates sources 1..j-1:
        // L_j = (t - c_{j-1})/(n - j + 1). Feasible iff L_j <= a_j
        // (source j really can sit at the level); feasible levels
        // decrease with j, so the answer is the MAX feasible — and
        // j = n is always feasible when t <= total, so one exists.
        val lev = ranked
          .withColumn("lj",
            ($"t" - $"cj" + $"avail").cast("double") / ($"n" - $"j" + 1L))
          .where($"lj" <= $"avail".cast("double"))
          .agg(max($"lj").as("level"))
        ranked.crossJoin(broadcast(lev))
          .select($"source", $"avail", $"t".as("budget"),
            round(lit(1.0) * least($"avail".cast("double"), $"level"), 6)
              .as("allocated"),
            ($"avail".cast("double") <= $"level").as("saturated"),
            round($"level", 6).as("level"))
          .orderBy($"source")
      },
      Some("""WITH avail AS (SELECT source,
             |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             |    AS BIGINT) AS avail
             |  FROM documents GROUP BY source),
             |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS all_tokens,
             |  count(*) AS n FROM avail),
             |ranked AS (SELECT source, avail, all_tokens // 2 AS t, n,
             |  row_number() OVER (ORDER BY avail, source) AS j,
             |  sum(avail) OVER (ORDER BY avail, source
             |    ROWS UNBOUNDED PRECEDING) AS cj
             |  FROM avail CROSS JOIN tot),
             |lev AS (SELECT max(lj) AS level
             |  FROM (SELECT j, avail,
             |    CAST(t - cj + avail AS DOUBLE) / (n - j + 1) AS lj
             |    FROM ranked)
             |  WHERE lj <= CAST(avail AS DOUBLE))
             |SELECT r.source, r.avail, r.t AS budget,
             |  round(1.0 * least(CAST(r.avail AS DOUBLE), lev.level), 6)
             |    AS allocated,
             |  CAST(r.avail AS DOUBLE) <= lev.level AS saturated,
             |  round(lev.level, 6) AS level
             |FROM ranked r CROSS JOIN lev ORDER BY r.source""".stripMargin))
  )

}