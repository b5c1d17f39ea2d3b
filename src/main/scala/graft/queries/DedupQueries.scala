package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.tables.Tables
import graft.text.{TextFunctions => TF}

/** Deduplication coverage over `documents` + `embeddings` (SURVEY §7.5).
  * EVERY path carries a DuckDB oracle: exact hashing and Jaccard via
  * builtins, and — since the hash family moved to FNV-1a ([[FnvSql]],
  * `graft.functions.Fnv`) — the MinHash-LSH banding pipeline and the
  * SimHash bit votes are replayed hash-for-hash in SQL too. Recall
  * against the brute-force truth additionally stays unit-tested.
  */
object DedupQueries extends QueryProvider {

  /** The MinHash chain through `bands(id, band, key)` — the prefix
    * shared by band-level consumers (sm13's index compare) that must
    * not pay for the pair tail: DuckDB evaluates MATERIALIZED CTEs
    * eagerly even when unreferenced, so the candidate/jaccard stages
    * live only in [[minhashPairCtes]]. MATERIALIZED placement here is
    * deliberate: `sig` feeds `bands` AND d10's direct signature
    * compares; permutations compute once per distinct gram hash (they
    * never depended on the doc), and the doc-level min re-joins hv.
    */
  /** [[minhashBandCtes]] over an arbitrary (doc_id, text) source CTE —
    * lets pipeline oracles (c36) run the identical chain over a
    * FILTERED document set instead of the raw table.
    */
  private[queries] def minhashBandCtesFrom(src: String): String =
    s"""t AS (SELECT doc_id AS id, regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM $src),
       |s AS (SELECT id, list_distinct(list_transform(range(1, len(tk)-1),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |  FROM t WHERE len(tk) >= 3),
       |shr AS (SELECT id, unnest(sh) AS g FROM s),
       |voc AS (SELECT DISTINCT g FROM shr),
       |gh AS (SELECT g, ${FnvSql.ofString("g")} AS hu FROM voc),
       |hv AS (SELECT DISTINCT id, hu FROM shr JOIN gh USING (g)),
       |permh AS (SELECT hu, i, ${FnvSql.toSigned("fu")} AS ps
       |  FROM (SELECT hu, p.i, ${FnvSql.permTail("p.acc0", "hu")} AS fu
       |    FROM (SELECT DISTINCT hu FROM hv) h
       |    CROSS JOIN (SELECT i, ${FnvSql.permPrefix("i")} AS acc0
       |      FROM (SELECT unnest(range(32)) AS i)) p)),
       |sig AS MATERIALIZED (SELECT id, i, min(ps) AS m
       |  FROM hv JOIN permh USING (hu) GROUP BY id, i),
       |bands AS (SELECT id, i // 4 AS band,
       |    string_agg(m::VARCHAR, ',' ORDER BY i) AS key
       |  FROM sig GROUP BY id, i // 4)""".stripMargin

  private[queries] val minhashBandCtes: String = minhashBandCtesFrom("documents")

  /** d04's full MinHash pipeline as CTEs ending in `jac(a, b, j)` —
    * shared by the d04 gate query, d07/d18/d25's clustering oracles and
    * the c14/c31/c35 leakage family. The multiply-referenced stages are
    * MATERIALIZED: DuckDB 1.x inlines CTEs per reference, and the
    * label-propagation / closure consumers reference their predecessors
    * twice per round — without materialization the chain re-evaluates
    * 2^rounds times (measured: d07 196 s → 6 s at sf0.001).
    */
  private[queries] def minhashPairCtesFrom(src: String): String =
    s"""${minhashBandCtesFrom(src)},
       |sized AS MATERIALIZED (SELECT * FROM (SELECT id, band, key,
       |    count(*) OVER (PARTITION BY band, key) AS bn FROM bands)
       |  WHERE bn <= 1000),
       |cand AS MATERIALIZED (SELECT DISTINCT l.id AS a, r.id AS b
       |  FROM sized l JOIN sized r ON l.band = r.band AND l.key = r.key AND l.id < r.id),
       |jac AS MATERIALIZED (SELECT a, b, iw * 1.0 / (la + lb - iw) AS j
       |  FROM (SELECT c.a, c.b, len(list_intersect(sa.sh, sb.sh)) AS iw,
       |      len(sa.sh) AS la, len(sb.sh) AS lb
       |    FROM cand c JOIN s sa ON sa.id = c.a JOIN s sb ON sb.id = c.b))""".stripMargin

  private[queries] val minhashPairCtes: String = minhashPairCtesFrom("documents")

  override val all: Seq[Q] = Seq(

    // md5 content-hash parity + normalization (whitespace collapse).
    Q(
      "d01_content_hashes",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir).filter($"doc_id" < 100)
          .select($"doc_id", md5(Dedup.normalized($"text")).as("content_hash"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    // Exact duplicate clusters (empty on corpora without planted exact
    // dups — the oracle still checks emptiness matches).
    Q(
      "d02_exact_clusters",
      (s, dir) => {
        import s.implicits._
        Dedup.exactClusters(Tables.documents(s, dir), "doc_id", "text")
          .filter($"n_docs" > 1)
          .select($"content_hash", $"n_docs",
            array_join($"doc_ids", ",").as("doc_ids"))
          .orderBy($"content_hash")
      },
      Some("""SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
             |count(*) AS n_docs,
             |string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
             |FROM documents
             |GROUP BY 1 HAVING count(*) > 1 ORDER BY content_hash""".stripMargin)),

    // Brute-force word-3-gram Jaccard pairs (the exact truth the LSH
    // path approximates). Deliberately bounded to a doc_id slice: the
    // quadratic exact path is the correctness/verify tool, never the
    // scale path — that is d04's LSH job.
    Q(
      "d03_jaccard_pairs",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir).filter($"doc_id" < 1000))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.bruteForceJaccardPairs(toks, 3, 0.05)
          .select($"a", $"b", round($"jaccard", 6).as("jaccard"))
          .orderBy($"a", $"b")
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents WHERE doc_id < 1000),
             |s AS (SELECT doc_id,
             |  list_distinct(list_transform(range(1, len(tk)-1),
             |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
             |  FROM t WHERE len(tk) >= 3)
             |SELECT a, b, round(iw * 1.0 / (la + lb - iw), 6) AS jaccard
             |FROM (SELECT a.doc_id AS a, b.doc_id AS b,
             |    len(list_intersect(a.sh, b.sh)) AS iw,
             |    len(a.sh) AS la, len(b.sh) AS lb
             |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
             |WHERE iw * 1.0 / (la + lb - iw) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // MinHash-LSH near-dup (the 100 TB path), hash-for-hash oracle: the
    // whole banding pipeline — FNV shingle hashes, seeded permutation
    // minima, band keys, bucket cap, candidate join, exact-Jaccard
    // verify — replayed in SQL.
    Q(
      "d04_minhash_neardup",
      (s, dir) => {
        import s.implicits._
        // fanOut at the SCAN so tokenization itself parallelizes (the
        // operator's internal fanOut can only widen what comes after it).
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.minhashNearDuplicates(toks, shingleN = 3, numHashes = 32,
          bands = 8, threshold = 0.3)
          .select($"a", $"b", round($"jaccard", 6).as("jaccard"))
          .orderBy($"a", $"b")
      },
      Some(
        s"""WITH $minhashPairCtes
           |SELECT a, b, round(j, 6) AS jaccard FROM jac WHERE j >= 0.3
           |ORDER BY a, b""".stripMargin),
      bench = true),

    // Near-dup CLUSTERS (the "keep one per component" step of a curation
    // pipeline): min-label propagation over the d04 pair graph, 3 fixed
    // rounds, oracle via the same pipeline + unrolled label CTEs.
    Q(
      "d07_neardup_clusters",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        Dedup.labelPropagationClusters(pairs, iterations = 3)
          .orderBy($"id")
      },
      Some {
        val rounds = (1 to 3).map { k =>
          s"""l$k AS (SELECT n.id, least(n.lbl, coalesce(min(l.lbl), n.lbl)) AS lbl
             |  FROM l${k - 1} n
             |  LEFT JOIN e2 ON e2.dst = n.id
             |  LEFT JOIN l${k - 1} l ON l.id = e2.src
             |  GROUP BY n.id, n.lbl)""".stripMargin
        }.mkString(",\n")
        s"""WITH $minhashPairCtes,
           |p2 AS (SELECT a, b FROM jac WHERE j >= 0.3),
           |e2 AS (SELECT a AS src, b AS dst FROM p2
           |  UNION ALL SELECT b AS src, a AS dst FROM p2),
           |l0 AS (SELECT DISTINCT dst AS id, dst AS lbl FROM e2),
           |$rounds
           |SELECT id, lbl AS cluster FROM l3 ORDER BY id""".stripMargin
      }),

    // SimHash near-dup, hash-for-hash oracle: FNV token hashes, per-bit
    // vote sums, signature assembly in HUGEINT (bit 63 = the sign bit
    // after the signed conversion), 16-bit chunk banding, Hamming check.
    // The oracle's vote stage compacts occurrences to (id, tok, count)
    // and joins a vocab-sized signed-bit table, so the 64-way fanout
    // carries only narrow integers (sum(c * sgn) == the per-occurrence
    // +-1 sum) — the HUGEINT bit tests stay vocabulary-sized. The
    // per-occurrence form spilled past the gate's 10 GB worker cap at
    // sf1 (750 s, the round-9 pool's crash trigger).
    Q(
      "d05_simhash_neardup",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.simhashNearDuplicates(toks, maxHamming = 3)
          .orderBy($"a", $"b")
      },
      Some(
        s"""WITH t AS (SELECT doc_id AS id, regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
           |tr AS (SELECT id, unnest(tk) AS tok FROM t),
           |voc AS (SELECT DISTINCT tok FROM tr),
           |th AS (SELECT tok, ${FnvSql.ofString("tok")} AS hu FROM voc),
           |bits AS (SELECT i, p FROM (SELECT unnest(range(64)) AS i,
           |    unnest(list_transform(range(64), k ->
           |      list_reduce(list_prepend(1::HUGEINT, list_transform(range(k), x -> 2::HUGEINT)),
           |        (a, b) -> a * b))) AS p)),
           |trc AS (SELECT id, tok, count(*) AS c FROM tr GROUP BY id, tok),
           |thb AS MATERIALIZED (SELECT h.tok, b.i,
           |    CASE WHEN (h.hu // b.p) % 2 = 1 THEN 1 ELSE -1 END AS sgn
           |  FROM th h CROSS JOIN bits b),
           |votes AS (SELECT r.id, t.i, sum(r.c * t.sgn) AS v
           |  FROM trc r JOIN thb t ON t.tok = r.tok
           |  GROUP BY r.id, t.i),
           |sigs AS (SELECT v.id, sum(CASE WHEN v.v > 0 THEN b.p ELSE 0::HUGEINT END) AS su
           |  FROM votes v JOIN bits b ON b.i = v.i GROUP BY v.id),
           |sig AS (SELECT id, su, ${FnvSql.toSigned("su")} AS s FROM sigs),
           |chunks AS (SELECT id, s, cp.j, (su // cp.p) % 65536 AS chunk
           |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS j,
           |    unnest([1::HUGEINT, 65536::HUGEINT, 4294967296::HUGEINT,
           |      281474976710656::HUGEINT]) AS p) cp),
           |pairs AS (SELECT DISTINCT l.id AS a, r.id AS b, l.s AS sa, r.s AS sb
           |  FROM chunks l JOIN chunks r ON l.j = r.j AND l.chunk = r.chunk AND l.id < r.id)
           |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
           |FROM pairs
           |WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b""".stripMargin)),

    // Embedding-cosine near-dup pairs (oracle via list_cosine_similarity).
    Q(
      "d06_cosine_neardup",
      (s, dir) => {
        import s.implicits._
        val vecs = Tables.embeddings(s, dir)
          .select($"vec_id".as("id"),
            graft.operators.Similarity.toDouble($"embedding").as("vec"))
        Dedup.cosineNearDuplicates(vecs, 0.0) // threshold applied on rounded value below
          .withColumn("cosine", round($"cosine", 6))
          .filter($"cosine" >= 0.35)
          .orderBy($"a", $"b")
      },
      Some("""SELECT a.vec_id AS a, b.vec_id AS b,
             |round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
             |ORDER BY a, b""".stripMargin)),

    // Edit-distance near-dup over the normalized text: the engine runs
    // the lossless length-banded equi-join (|len Δ| ≤ k bounds band Δ
    // to ≤ 1 — pigeonhole, exact recall); the oracle states the naive
    // length-prefiltered quadratic independently. Both engines share
    // the classic Wagner-Fischer levenshtein definition.
    Q(
      "d08_editdist_neardup",
      (s, dir) => {
        import s.implicits._
        // Bounded slice (like d03/d13): full-text levenshtein is the
        // quadratic TRUTH path — unsliced at sf0.1 it is ~10^13 DP
        // cells and never finishes. The operator's production inputs
        // are short near-dup CLUSTER keys, not whole documents.
        val keys = Tables.documents(s, dir).filter($"doc_id" < 500)
          .select($"doc_id".as("id"), Dedup.normalized($"text").as("key"))
        Dedup.editDistanceNearDuplicates(keys, maxDist = 8)
          .select($"a", $"b", $"dist".cast("int").as("dist"))
          .orderBy($"a", $"b")
      },
      Some("""WITH n AS (SELECT doc_id AS id,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k
             |  FROM documents WHERE doc_id < 500),
             |cand AS (SELECT a.id AS a, b.id AS b, a.k AS ka, b.k AS kb
             |  FROM n a JOIN n b ON a.id < b.id
             |    AND length(b.k) BETWEEN length(a.k) - 8 AND length(a.k) + 8)
             |SELECT a, b, CAST(levenshtein(ka, kb) AS INTEGER) AS dist
             |FROM cand WHERE levenshtein(ka, kb) <= 8
             |ORDER BY a, b""".stripMargin)),

    // Benchmark-contamination check (decontamination, the eval-hygiene
    // twin of dedup): corpus documents sharing any 4-gram shingle with
    // the "benchmark" subset (doc_id % 50 = 0 stands in for an eval
    // set), with the shared-shingle count and contamination ratio.
    // Scale shape: the benchmark n-gram set is tiny relative to the
    // corpus — it broadcasts — and the corpus side is one distinct
    // explode + broadcast semi-join + count aggregate; no quadratic
    // document pairing anywhere.
    Q(
      "d09_contamination",
      (s, dir) => {
        import s.implicits._
        val sh = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            array_distinct(Dedup.shingles(TF.tokenize($"text"), 4)).as("sh"))
        val bench = sh.filter($"doc_id" % 50 === 0)
          .select(explode($"sh").as("g")).distinct()
        sh.filter($"doc_id" % 50 =!= 0)
          .select($"doc_id", size($"sh").cast("long").as("n_shingles"),
            explode($"sh").as("g"))
          .join(broadcast(bench), Seq("g"))
          .groupBy($"doc_id", $"n_shingles")
          .agg(count(lit(1)).as("n_shared"))
          .select($"doc_id", $"n_shingles", $"n_shared",
            round($"n_shared" * 1.0 / $"n_shingles", 6).as("contamination"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
             |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk)-2),
             |    i -> array_to_string(tk[i:i+3], ' '))) AS sh
             |  FROM t WHERE len(tk) >= 4),
             |b AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 50 = 0),
             |c AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
             |    unnest(sh) AS g FROM s WHERE doc_id % 50 <> 0)
             |SELECT doc_id, n_shingles, count(*) AS n_shared,
             |round(count(*) * 1.0 / n_shingles, 6) AS contamination
             |FROM c JOIN b USING (g) GROUP BY doc_id, n_shingles
             |ORDER BY doc_id""".stripMargin)),

    // MinHash ESTIMATION accuracy, in-gate: for every LSH candidate
    // pair, the signature-agreement Jaccard estimate (what a 100 TB
    // run would use — it never touches the shingle sets again) next to
    // the exact Jaccard (the truth the gate can still afford at this
    // scale). est is an exact multiple of 1/32, so the hash compare is
    // stable; the estimate-vs-truth residual is the quantity the d04
    // threshold dial trades against bands/rows. Same banding plan as
    // d04: linear signature build, bucket join, no all-pairs stage.
    Q(
      "d10_minhash_estimate",
      (s, dir) => {
        import s.implicits._
        val sh = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
          .select($"id",
            array_distinct(Dedup.shingles($"tokens", 3)).as("sh"))
          .filter(size($"sh") > 0)
          .persist()
        val sigs = sh
          .withColumn("hv", Dedup.shingleHashes($"sh"))
          .withColumn("sig", Dedup.minhashSignature($"hv", 32))
          .select($"id", $"sig")
        val cands = Dedup.lshCandidates(sigs, bands = 8, rowsPerBand = 4)
        cands
          .join(sigs.select($"id".as("a"), $"sig".as("sig_a")), "a")
          .join(sigs.select($"id".as("b"), $"sig".as("sig_b")), "b")
          .join(sh.select($"id".as("a"), $"sh".as("sh_a")), "a")
          .join(sh.select($"id".as("b"), $"sh".as("sh_b")), "b")
          .select($"a", $"b",
            round(size(filter(zip_with($"sig_a", $"sig_b", (x, y) => x === y),
              m => m)).cast("double") / lit(32.0), 6).as("est_jaccard"),
            round(Dedup.jaccard($"sh_a", $"sh_b"), 6).as("jaccard"))
          .orderBy($"a", $"b")
      },
      Some(
        s"""WITH $minhashPairCtes,
           |est AS (SELECT c.a, c.b,
           |    sum(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END) / 32.0 AS e
           |  FROM cand c
           |  JOIN sig sa ON sa.id = c.a
           |  JOIN sig sb ON sb.id = c.b AND sb.i = sa.i
           |  GROUP BY c.a, c.b)
           |SELECT a, b, round(e, 6) AS est_jaccard, round(j, 6) AS jaccard
           |FROM est JOIN jac USING (a, b)
           |ORDER BY a, b""".stripMargin)),

    // Bloom-filter decontamination — the 100 TB form of d09: instead of
    // broadcasting the full benchmark shingle set, broadcast its
    // constant-size Bloom bit set (sk06's state) and flag corpus docs
    // whose ANY 4-gram probes fully set. Verified against the exact
    // shared-shingle count side by side: n_bloom >= n_exact per doc
    // (no false negatives), the overhang being the false-positive cost
    // of the m/k dial. Shape: build = explode+distinct (≤ m rows),
    // probe = broadcast join per shingle — the corpus side never
    // shuffles its text anywhere.
    Q(
      "d11_bloom_decontam",
      (s, dir) => {
        import s.implicits._
        import graft.operators.BloomFilter
        val (m, k) = (SketchQueries.BloomM, SketchQueries.BloomK)
        val sh = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id",
            array_distinct(Dedup.shingles(TF.tokenize($"text"), 4)).as("sh"))
        val bench = sh.filter($"doc_id" % 50 === 0)
          .select(explode($"sh").as("g")).distinct()
        val words = BloomFilter.bitmap(BloomFilter.bitsTable(bench, $"g", k, m), m)
        val corpus = sh.filter($"doc_id" % 50 =!= 0)
          .select($"doc_id", explode($"sh").as("g"))
        val flagged = BloomFilter.mightContain(words, corpus, $"g", k, m)
          .groupBy($"doc_id").agg(count(lit(1)).as("n_bloom"))
        val exact = corpus.join(broadcast(bench), Seq("g"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_exact"))
        flagged.join(exact, Seq("doc_id"), "left")
          .select($"doc_id", $"n_bloom", coalesce($"n_exact", lit(0L)).as("n_exact"))
          .orderBy($"doc_id")
      },
      Some {
        val (m, k) = (SketchQueries.BloomM, SketchQueries.BloomK)
        s"""WITH t AS (SELECT doc_id,
           |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
           |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk)-2),
           |    i -> array_to_string(tk[i:i+3], ' '))) AS sh
           |  FROM t WHERE len(tk) >= 4),
           |b AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 50 = 0),
           |corpus AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 50 <> 0),
           |gset AS (SELECT DISTINCT g FROM corpus),
           |allg AS (SELECT g FROM gset UNION SELECT g FROM b),
           |gh AS (SELECT g, ${FnvSql.ofString("g")} AS hu FROM allg),
           |gp AS (SELECT g, list_distinct(list_transform(range($k),
           |    d -> CAST(${FnvSql.perm("d", "hu")} % $m::HUGEINT AS INTEGER))) AS pos
           |  FROM gh),
           |bits AS (SELECT DISTINCT unnest(pos) AS bit FROM gp JOIN b USING (g)),
           |pr AS (SELECT gp.g, len(gp.pos) AS np, unnest(gp.pos) AS bit
           |  FROM gp JOIN gset USING (g)),
           |hits AS (SELECT g FROM pr JOIN bits USING (bit)
           |  GROUP BY g, np HAVING count(*) = np),
           |nb AS (SELECT doc_id, count(*) AS n_bloom
           |  FROM corpus JOIN hits USING (g) GROUP BY doc_id),
           |ne AS (SELECT doc_id, count(*) AS n_exact
           |  FROM corpus JOIN b USING (g) GROUP BY doc_id)
           |SELECT nb.doc_id, nb.n_bloom, coalesce(ne.n_exact, 0) AS n_exact
           |FROM nb LEFT JOIN ne ON ne.doc_id = nb.doc_id
           |ORDER BY nb.doc_id""".stripMargin
      }),

    // SemDeDup-style clustered semantic dedup: deterministic Lloyd
    // k-means (the s03 quantizer) partitions the embedding space, the
    // quadratic cosine stage runs only WITHIN clusters, each near-dup
    // group keeps its lowest id. The oracle recomputes the clustering
    // itself (shared LloydSql replay) and the within-cluster pruning —
    // so the gate checks the composed semantics end to end, not a
    // stored assignment.
    Q(
      "d12_semantic_dedup",
      (s, dir) => {
        import s.implicits._
        val vecs = Tables.embeddings(s, dir)
          .select($"vec_id".as("id"),
            graft.operators.Similarity.toDouble($"embedding").as("vec"))
        Dedup.semanticDedup(vecs, nClusters = 16, lloydIters = 2, tau = 0.35)
          .orderBy($"id")
      },
      Some(s"""WITH ${LloydSql.ctes(16, 2)},
              |pairs AS (SELECT l.id AS a, r.id AS b,
              |    round(list_cosine_similarity(l.e, r.e), 6) AS c
              |  FROM af l JOIN af r ON l.cluster = r.cluster AND l.id < r.id),
              |d AS (SELECT b AS id, count(*) AS n_dups_lower
              |  FROM pairs WHERE c >= 0.35 GROUP BY b)
              |SELECT af.id, CAST(af.cluster AS INTEGER) AS cluster,
              |CAST(coalesce(d.n_dups_lower, 0) AS BIGINT) AS n_dups_lower,
              |coalesce(d.n_dups_lower, 0) = 0 AS keep
              |FROM af LEFT JOIN d ON d.id = af.id
              |ORDER BY af.id""".stripMargin)),

    // Asymmetric containment |A∩B|/|A| ≥ 0.5 — sub-document duplication
    // (Jaccard misses a small doc swallowed by a big one). The Spark
    // plan is the SCALE path (prefix-filtered inverted-index candidates
    // + exact verify — see Dedup.containmentPairs); the oracle is the
    // all-pairs truth. They must agree exactly: the prefix filter is
    // lossless for the threshold, so this gate proves the optimized
    // candidate generation drops nothing.
    Q(
      "d13_containment",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(
          Tables.documents(s, dir).filter($"doc_id" < 1000))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.containmentPairs(toks, 3, 0.5)
          .select($"a", $"b", round($"containment", 6).as("containment"))
          .orderBy($"a", $"b")
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents WHERE doc_id < 1000),
             |s AS (SELECT doc_id,
             |  list_distinct(list_transform(range(1, len(tk)-1),
             |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
             |  FROM t WHERE len(tk) >= 3)
             |SELECT a, b, round(iw * 1.0 / la, 6) AS containment
             |FROM (SELECT a.doc_id AS a, b.doc_id AS b,
             |    len(list_intersect(a.sh, b.sh)) AS iw, len(a.sh) AS la
             |  FROM s a JOIN s b ON a.doc_id <> b.doc_id)
             |WHERE iw * 1.0 / la >= 0.5
             |ORDER BY a, b""".stripMargin)),

    // Blocked sorted-neighborhood (merge/purge) near-dup pairs — the
    // third candidate-generation family beside hashing (d04) and
    // indexing (d13): block on the first token, sort each block by the
    // 3-token prefix, compare each doc only with its next 5 neighbors
    // in sort order. One shuffle partitioned by the BLOCKING key (no
    // global sort), all leads off that single per-block sort, fused
    // exact-Jaccard verify — O(n·w) work at any corpus size. The
    // oracle replays the identical block/sort/lead windows and the
    // rounded-Jaccard threshold.
    Q(
      "d14_sorted_neighborhood",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.documents(s, dir)
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.sortedNeighborhoodPairs(toks, 3, windowSize = 6, tau = 0.05)
          .orderBy($"a", $"b")
      },
      Some(d14OracleSql)),

    // Sparse TF-IDF cosine pairs via the inverted index: documents
    // sharing no token never meet — the pair space comes from a
    // postings self-join keyed on TOKEN, with a df cap pruning
    // stop-tokens before the join (each token's pair cost is O(df²);
    // the cap bounds it the way LSH's maxBucket does). Weights are
    // integer-quantized so every dot product and squared norm is an
    // exact integer sum — order-independent under any partitioning and
    // hash-identical to the oracle; the only float math is the final
    // sqrt/divide per surviving pair.
    Q(
      "d15_tfidf_cosine",
      (s, dir) => {
        import s.implicits._
        graft.operators.Similarity.tfidfCosinePairs(
          graft.Par.fanOut(Tables.documents(s, dir)), "doc_id",
          TF.tokenize($"text"), quantScale = 1e4, maxDfFrac = 0.5, tau = 0.3)
          .orderBy($"a", $"b")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tok FROM documents),
             |corpus AS (SELECT count(*) AS n_docs FROM t),
             |tf AS (SELECT doc_id, tok2 AS tok, count(*) AS tf FROM
             |  (SELECT doc_id, unnest(tok) AS tok2 FROM t) GROUP BY doc_id, tok2),
             |dfx AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
             |w AS (SELECT tf.doc_id, tf.tok,
             |  CAST(round((tf * ln(n_docs::DOUBLE / df)) * 10000.0::DOUBLE) AS BIGINT) AS wq
             |  FROM tf JOIN dfx USING (tok) CROSS JOIN corpus
             |  WHERE df <= n_docs * 0.5::DOUBLE),
             |wk AS (SELECT doc_id, tok, wq FROM w WHERE wq > 0),
             |nrm AS (SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS nsq
             |  FROM wk GROUP BY doc_id),
             |d AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
             |  CAST(sum(a.wq * b.wq) AS BIGINT) AS dot
             |  FROM wk a JOIN wk b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |  GROUP BY a.doc_id, b.doc_id),
             |c AS (SELECT ida AS a, idb AS b,
             |  round(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cosine
             |  FROM d JOIN nrm na ON na.doc_id = d.ida
             |         JOIN nrm nb ON nb.doc_id = d.idb)
             |SELECT a, b, cosine FROM c WHERE cosine >= 0.3
             |ORDER BY a, b""".stripMargin),
      bench = true),

    // Repeated-substring duplication profile (Lee et al.'s
    // suffix-array dedup signal, shuffle-shaped): every character
    // 40-gram, stride 1, hashed and counted corpus-wide; per doc, the
    // fraction of positions whose 40-gram occurs >= 2 times anywhere.
    // Unlike the pairwise truth paths (d03/d08) this is LINEAR in
    // corpus bytes — one Generate, one hash agg, one equi-join — so
    // the same plan runs at 100 TB. Gram identity is md5 on both
    // engines (see Dedup.repeatedSpanStats for the at-scale variant).
    Q(
      "d16_repeated_spans",
      (s, dir) => {
        import s.implicits._
        Dedup.repeatedSpanStats(
          Tables.documents(s, dir).select($"doc_id", $"text"),
          "doc_id", "text", k = 40)
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH g AS (SELECT doc_id, md5(substr(text, i, 40)) AS gh
             |  FROM documents, unnest(range(1, length(text)-38)) AS t(i)
             |  WHERE length(text) >= 40),
             |c AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh),
             |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos,
             |  CAST(count(*) FILTER (WHERE cnt >= 2) AS BIGINT) AS n_dup
             |  FROM g JOIN c USING (gh) GROUP BY doc_id)
             |SELECT documents.doc_id,
             |  coalesce(n_pos, 0) AS n_pos, coalesce(n_dup, 0) AS n_dup,
             |  round(coalesce(n_dup, 0) / greatest(coalesce(n_pos, 0), 1), 6)
             |    AS dup_ratio
             |FROM documents LEFT JOIN d USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Dedup yield curve: how many pairs fire and how many docs a
    // pairwise keep-min-id rule would drop at each Jaccard threshold —
    // the sweep an operator runs BEFORE committing a corpus-wide dedup
    // threshold. One pair table (the d03 bounded slice), one broadcast
    // of a 7-row grid; removed(t) = distinct max-ids among pairs ≥ t.
    Q(
      "d17_threshold_yield",
      (s, dir) => {
        import s.implicits._
        val slice = Tables.documents(s, dir).filter($"doc_id" < 1000)
        val toks = graft.Par.fanOut(slice)
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.bruteForceJaccardPairs(toks, 3, 0.05)
          .select($"a", $"b", round($"jaccard", 6).as("j"))
        val grid = s.createDataFrame(
            Seq(0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9).map(Tuple1(_)))
          .toDF("threshold")
        val tot = slice.agg(count(lit(1)).as("n_docs"))
        broadcast(grid).join(pairs, pairs("j") >= grid("threshold"), "left")
          .groupBy($"threshold")
          .agg(count($"a").as("n_pairs"),
            countDistinct($"b").as("n_removed"))
          .crossJoin(broadcast(tot))
          .select($"threshold", $"n_pairs", $"n_removed",
            ($"n_docs" - $"n_removed").as("n_survivors"))
          .orderBy($"threshold")
      },
      Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk
             |  FROM documents WHERE doc_id < 1000),
             |s AS (SELECT doc_id,
             |  list_distinct(list_transform(range(1, len(tk)-1),
             |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
             |  FROM t WHERE len(tk) >= 3),
             |p AS (SELECT a, b, round(iw * 1.0 / (la + lb - iw), 6) AS j
             |  FROM (SELECT a.doc_id AS a, b.doc_id AS b,
             |      len(list_intersect(a.sh, b.sh)) AS iw,
             |      len(a.sh) AS la, len(b.sh) AS lb
             |    FROM s a JOIN s b ON a.doc_id < b.doc_id)
             |  WHERE iw * 1.0 / (la + lb - iw) >= 0.05),
             |g AS (SELECT unnest([0.05,0.1,0.2,0.3,0.5,0.7,0.9]::DOUBLE[])
             |  AS threshold),
             |tot AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 1000)
             |SELECT g.threshold, count(p.a) AS n_pairs,
             |  CAST(count(DISTINCT p.b) AS BIGINT) AS n_removed,
             |  CAST(tot.n_docs - count(DISTINCT p.b) AS BIGINT) AS n_survivors
             |FROM g LEFT JOIN p ON p.j >= g.threshold CROSS JOIN tot
             |GROUP BY g.threshold, tot.n_docs ORDER BY threshold""".stripMargin)),

    // CONVERGED near-dup components over the d04 pair graph — the
    // scale-correct closure of d07: alternating large-star/small-star
    // rounds (Kiveris et al. 2014) reach the fixpoint in O(log n)
    // rounds at ANY component diameter, where d07's reference-faithful
    // fixed-3-round propagation under-merges chains longer than 3 hops.
    // The oracle computes the true fixpoint independently: a recursive
    // CTE propagates labels to transitive closure and takes the min
    // per node — so the gate proves actual convergence, not just
    // agreement with another iteration count.
    Q(
      "d18_neardup_components",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        Dedup.connectedComponents(pairs.select($"a", $"b"))
          .orderBy($"id")
      },
      Some(s"""WITH RECURSIVE $minhashPairCtes,
              |pr AS (SELECT a, b FROM jac WHERE j >= 0.3),
              |e2 AS (SELECT a AS src, b AS dst FROM pr
              |  UNION SELECT b, a FROM pr),
              |n AS (SELECT DISTINCT src AS id FROM e2),
              |lbl AS (
              |  SELECT id, id AS l FROM n
              |  UNION
              |  SELECT e2.dst AS id, lbl.l FROM lbl
              |  JOIN e2 ON e2.src = lbl.id
              |)
              |SELECT id, min(l) AS component FROM lbl
              |GROUP BY id ORDER BY id""".stripMargin)),

    // Cross-document duplicated-n-gram rate (see Dedup.dupGramRate) —
    // the RefinedWeb/FineWeb corpus-global quality signal, distinct
    // from a06 (within-doc repetition) and d09 (overlap vs a fixed
    // benchmark set). The oracle replays shingling, in-doc occurrence
    // counts, gram document frequency and the rate join in SQL.
    // 100 TB route: Dedup.dupGramRateSketch swaps the exact gram-df
    // join for a broadcast CMS probe (no gram-keyed shuffle of the
    // probe side; one-sided overcount pinned by DupGramSketchSpec) —
    // the gate stays on the exact route so the oracle stays exact.
    Q(
      "d19_dupgram_rate",
      (s, dir) => {
        import s.implicits._
        Dedup.dupGramRate(Tables.documents(s, dir), "doc_id", "text", 5)
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
             |s AS (SELECT doc_id, list_transform(range(1, len(tk)-3),
             |    i -> array_to_string(tk[i:i+4], ' ')) AS sh
             |  FROM t WHERE len(tk) >= 5),
             |occ AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_grams,
             |    unnest(sh) AS g FROM s),
             |pd AS (SELECT doc_id, n_grams, g, count(*) AS cnt
             |  FROM occ GROUP BY doc_id, n_grams, g),
             |df AS (SELECT g, count(*) AS ndocs FROM pd GROUP BY g)
             |SELECT pd.doc_id, pd.n_grams,
             |  CAST(sum(CASE WHEN df.ndocs >= 2 THEN pd.cnt ELSE 0 END)
             |    AS BIGINT) AS dup_occ,
             |  round(sum(CASE WHEN df.ndocs >= 2 THEN pd.cnt ELSE 0 END)
             |    * 1.0 / pd.n_grams, 6) AS dup_frac
             |FROM pd JOIN df USING (g)
             |GROUP BY pd.doc_id, pd.n_grams
             |ORDER BY pd.doc_id""".stripMargin)),

    // d19's 100 TB route as a first-class runnable: the probe-side
    // gram join swapped for a Bloom filter over the DUPLICATED grams
    // (see Dedup.dupGramRateBloom — the df aggregate stays
    // combiner-friendly, the join back becomes a narrow broadcast
    // membership probe; Dedup.dupGramRateSketch is the one-pass CMS
    // alternative). Stress-tier, not gate: the output is a deliberate
    // one-sided ESTIMATE (Bloom/CMS can only overcount), so its
    // contract vs the exact route — est >= exact row-for-row, equality
    // when the sketch comfortably fits the key set — is pinned by
    // DupGramSketchSpec, while d19 above keeps the exact semantics
    // under the DuckDB hash gate.
    Q(
      "d31_dupgram_sketch",
      (s, dir) => {
        import s.implicits._
        Dedup.dupGramRateBloom(Tables.documents(s, dir), "doc_id", "text",
            5, k = 6, mBits = 1 << 22)
          .orderBy($"doc_id")
      },
      None,
      gate = false),

    // Exact-substring span REMOVAL (Dedup.removeRepeatedSpans) — the
    // cut step d16 only measures: corpus-duplicated 40-char windows are
    // merged into maximal spans and excised, emitting the deduplicated
    // corpus itself. The oracle replays the gram table, the cnt>=2
    // set, the gaps-and-islands interval merge (lag window) and the
    // segment-stitch cut in SQL; clean_text is hash-compared verbatim.
    Q(
      "d20_span_removal",
      (s, dir) => {
        import s.implicits._
        Dedup.removeRepeatedSpans(
          Tables.documents(s, dir).select($"doc_id", $"text"),
          "doc_id", "text", k = 40)
          .withColumnRenamed("id", "doc_id")
          .orderBy($"doc_id")
      },
      Some(spanRemovalOracleSql)),

    // Probabilistic record linkage (operators/RecordLinkage.scala,
    // Fellegi-Sunter): match customers against a deterministically
    // dirtied second source (name truncated to its 16-char prefix,
    // balance coarsened to the nearest 100) — nation-blocked pairs,
    // per-field agreement, u rates estimated from non-twin pairs,
    // log-likelihood-ratio scores, best-candidate-per-record
    // assignment. The oracle replays the dirtying, the u aggregate,
    // the clamped ln weights and the ranked assignment.
    Q(
      "d21_record_linkage",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
        // fanOut the probe side: the blocked join multiplies each row
        // ~|block|-fold; a one-row-group scan would pin the whole pair
        // expansion onto a single task
        val a = graft.Par.fanOut(cust)
          .select($"c_custkey".as("a_key"), $"c_name",
            $"c_nationkey", $"c_acctbal", $"c_mktsegment")
        val b = cust.select($"c_custkey".as("b_key"),
          substring($"c_name", 1, 16).as("nm16"),
          $"c_nationkey", round($"c_acctbal", -2).as("bal100"),
          $"c_mktsegment".as("segb"))
        val pairs = a.join(b, Seq("c_nationkey"))
          .select($"a_key", $"b_key",
            (substring($"c_name", 1, 16) === $"nm16").as("agree_name"),
            (abs($"c_acctbal" - $"bal100") <= 50.0).as("agree_bal"),
            ($"c_mktsegment" === $"segb").as("agree_seg"))
        val scored = graft.operators.RecordLinkage.fellegiSunter(
          pairs, Seq("agree_name", "agree_bal", "agree_seg"),
          Map("agree_name" -> 0.95, "agree_bal" -> 0.9,
            "agree_seg" -> 0.95),
          $"a_key" =!= $"b_key")
        // best candidate per record as ONE hash aggregate (map-side
        // combinable max over struct(score, -b_key, ...)) — no
        // pairs-sized window shuffle+sort; picks the same winner as
        // the oracle's row_number (score DESC, b_key ASC)
        scored.groupBy($"a_key")
          .agg(max(struct($"score", (-$"b_key").as("nb"), $"b_key",
            $"agree_name", $"agree_bal", $"agree_seg")).as("m"))
          .filter($"m.score" > 0)
          .select($"a_key", $"m.b_key".as("b_key"),
            $"m.agree_name".as("agree_name"),
            $"m.agree_bal".as("agree_bal"),
            $"m.agree_seg".as("agree_seg"), $"m.score".as("score"))
          .orderBy($"a_key")
      },
      Some(linkageOracleSql)),


    // Triangle census over the near-dup pair graph — the structural
    // diagnostic between pairs (d03) and components (d18): a clique-y
    // neighborhood (clustering coeff -> 1) is a true duplicate SET
    // where keep-one-per-component is safe; a chain (coeff -> 0) is
    // lexical drift where transitive merging over-deletes. Triangles
    // enumerate via two equi-joins of the a<b edge list (x<y<z once
    // each); per-node counts from one explode. At 100 TB the edge list
    // comes from the LSH candidate path and the joins get the standard
    // degree-orientation bound — the join shape below is unchanged.
    Q(
      "d22_triangle_census",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(
            Tables.documents(s, dir).filter($"doc_id" < 1000))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val e = Dedup.bruteForceJaccardPairs(toks, 3, 0.02)
          .select($"a", $"b").persist() // feeds degree + 3 join legs
        val deg = e.select($"a".as("v"))
          .unionByName(e.select($"b".as("v")))
          .groupBy($"v").agg(count(lit(1)).as("degree"))
        val paths = e.as("e1").join(e.as("e2"), $"e1.b" === $"e2.a")
          .select($"e1.a".as("x"), $"e1.b".as("y"), $"e2.b".as("z"))
        val tri = paths.join(e.as("e3"),
          $"x" === $"e3.a" && $"z" === $"e3.b")
        val perNode = tri
          .select(explode(array($"x", $"y", $"z")).as("v"))
          .groupBy($"v").agg(count(lit(1)).as("n_tri"))
        deg.join(perNode, Seq("v"), "left")
          .select($"v".as("doc_id"), $"degree",
            coalesce($"n_tri", lit(0L)).as("n_tri"))
          .withColumn("clustering", round(
            when($"degree" >= 2,
              lit(2.0) * $"n_tri" / ($"degree" * ($"degree" - 1)))
              .otherwise(lit(0.0)), 6))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk
             |  FROM documents WHERE doc_id < 1000),
             |s AS (SELECT doc_id,
             |  list_distinct(list_transform(range(1, len(tk)-1),
             |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
             |  FROM t WHERE len(tk) >= 3),
             |e AS MATERIALIZED (SELECT a, b
             |  FROM (SELECT a.doc_id AS a, b.doc_id AS b,
             |      len(list_intersect(a.sh, b.sh)) AS iw,
             |      len(a.sh) AS la, len(b.sh) AS lb
             |    FROM s a JOIN s b ON a.doc_id < b.doc_id)
             |  WHERE iw * 1.0 / (la + lb - iw) >= 0.02),
             |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM
             |  (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
             |tr AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1 JOIN e e2 ON e1.b = e2.a
             |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |pn AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM
             |  (SELECT x AS v FROM tr UNION ALL SELECT y FROM tr
             |   UNION ALL SELECT z FROM tr) GROUP BY v)
             |SELECT deg.v AS doc_id, deg.degree,
             |  coalesce(pn.n_tri, 0) AS n_tri,
             |  round(CASE WHEN deg.degree >= 2
             |    THEN 2.0 * coalesce(pn.n_tri, 0)
             |      / (deg.degree * (deg.degree - 1))
             |    ELSE 0.0 END, 6) AS clustering
             |FROM deg LEFT JOIN pn ON pn.v = deg.v
             |ORDER BY doc_id""".stripMargin)),

    // Dedup-pipeline EVAL on planted duplicates — the d-family analog
    // of s12's ANN recall: every doc_id < 200 gets a planted near-copy
    // (id + 100000, one appended token), the d04 MinHash-LSH pipeline
    // runs over the union corpus, and the harness scores how many
    // planted pairs the banding recovered plus how many non-planted
    // pairs fired (original-corpus dups are legitimate hits, reported
    // separately). This is the acceptance test run before trusting an
    // LSH config corpus-wide — recall on KNOWN duplicates, not just
    // agreement with a threshold. Oracle: the full minhash chain
    // replayed over the SAME planted union.
    Q(
      "d23_dedup_eval",
      (s, dir) => {
        import s.implicits._
        val base = Tables.documents(s, dir).select($"doc_id", $"text")
        val planted = base.filter($"doc_id" < 200)
          .select(($"doc_id" + 100000L).as("doc_id"),
            concat($"text", lit(" plantedcopy")).as("text"))
        val toks = graft.Par.fanOut(base.unionByName(planted))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        val isPlanted = $"b" === $"a" + 100000L && $"a" < 200
        pairs.agg(
            count(when(isPlanted, 1)).as("planted_found"),
            count(when(!isPlanted, 1)).as("other_pairs"))
          .select(lit(200L).as("planted_total"),
            $"planted_found", $"other_pairs",
            round($"planted_found" / 200.0, 6).as("recall"))
      },
      Some {
        val plantedChain = DedupQueries.minhashPairCtes.replace(
          "FROM documents)",
          "FROM pl)")
        s"""WITH pl AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' plantedcopy'
           |  FROM documents WHERE doc_id < 200),
           |$plantedChain,
           |f AS (SELECT a, b, (b = a + 100000 AND a < 200) AS planted
           |  FROM jac WHERE j >= 0.3)
           |SELECT CAST(200 AS BIGINT) AS planted_total,
           |  CAST(count(CASE WHEN planted THEN 1 END) AS BIGINT)
           |    AS planted_found,
           |  CAST(count(CASE WHEN NOT planted THEN 1 END) AS BIGINT)
           |    AS other_pairs,
           |  round(count(CASE WHEN planted THEN 1 END) / 200.0, 6)
           |    AS recall
           |FROM f""".stripMargin
      }),

    // LSH noise-sensitivity curve (d24) — d23 swept across mutation
    // strength: docs 0-99 get planted copies at THREE noise levels
    // (1 / 8 / 24 appended per-doc-unique junk tokens, Jaccard ~0.95 /
    // ~0.84 / ~0.67), one LSH run over the union, recall per level.
    // This is the curve that says where the (32,8,4) banding config
    // stops seeing mutated duplicates — the counterpart of s13's
    // band-layout sweep on the similarity axis. Junk tokens embed the
    // doc id so planted copies never share shingles with each other.
    Q(
      "d24_noise_recall_curve",
      (s, dir) => {
        import s.implicits._
        val base = Tables.documents(s, dir).select($"doc_id", $"text")
        // junk must be ALPHABETIC (the [a-zA-Z]+ tokenizer drops
        // digits): encode ids as letters via translate
        def letters(c: org.apache.spark.sql.Column) =
          translate(c.cast("string"), "0123456789", "abcdefghij")
        def junk(level: Int) = array_join(
          transform(sequence(lit(1), lit(level)),
            i => concat(lit("zq"), letters($"doc_id"), lit("n"),
              letters(i))), " ")
        val planted = Seq(1, 8, 24).zipWithIndex.map { case (lv, ix) =>
          // junk FIRST, shift SECOND: a one-step select would let
          // Spark's lateral-column-alias resolution point junk's
          // doc_id at the SHIFTED alias (DuckDB's unaliased select
          // reads the original column — silent divergence, observed)
          base.filter($"doc_id" < 100)
            .select($"doc_id", concat($"text", lit(" "), junk(lv))
              .as("text"))
            .select(($"doc_id" + lit(100000L) * (ix + 1)).as("doc_id"),
              $"text")
        }.reduce(_ unionByName _)
        val toks = graft.Par.fanOut(base.unionByName(planted))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        val lvls = s.createDataFrame(Seq((1, 1), (2, 8), (3, 24)))
          .toDF("ix", "noise_tokens")
        broadcast(lvls).join(pairs,
            $"b" === $"a" + lit(100000L) * $"ix" && $"a" < 100, "left")
          .groupBy($"ix", $"noise_tokens")
          .agg(count($"a").as("found"))
          .select($"noise_tokens", lit(100L).as("planted"), $"found",
            round($"found" / 100.0, 6).as("recall"))
          .orderBy($"noise_tokens")
      },
      Some {
        val junkSql = (lv: Int, ix: Int) =>
          s"""SELECT doc_id + ${100000L * ix}, text || ' ' ||
             |  array_to_string(list_transform(range(1, ${lv + 1}), i ->
             |    'zq' || translate(doc_id::VARCHAR, '0123456789',
             |    'abcdefghij') || 'n' || translate(i::VARCHAR,
             |    '0123456789', 'abcdefghij')), ' ')
             |FROM documents WHERE doc_id < 100""".stripMargin
        val plantedChain = DedupQueries.minhashPairCtes.replace(
          "FROM documents)", "FROM pl)")
        s"""WITH pl AS (SELECT doc_id, text FROM documents
           |  UNION ALL ${junkSql(1, 1)}
           |  UNION ALL ${junkSql(8, 2)}
           |  UNION ALL ${junkSql(24, 3)}),
           |$plantedChain,
           |f AS (SELECT a, b FROM jac WHERE j >= 0.3),
           |lv AS (SELECT unnest([1, 2, 3]) AS ix,
           |  unnest([1, 8, 24]) AS noise_tokens)
           |SELECT lv.noise_tokens, CAST(100 AS BIGINT) AS planted,
           |  CAST(count(f.a) AS BIGINT) AS found,
           |  round(count(f.a) / 100.0, 6) AS recall
           |FROM lv LEFT JOIN f
           |  ON f.b = f.a + 100000 * lv.ix AND f.a < 100
           |GROUP BY lv.noise_tokens ORDER BY lv.noise_tokens""".stripMargin
      }),

    // Medoid survivor selection (d25) — the SemDeDup-grade alternative
    // to c09's keep-min-id: within each near-dup cluster (the d07
    // propagation over d04 pairs), keep the most TYPICAL member — the
    // one maximizing summed Jaccard to its cluster-mates (ties to the
    // lower id). Pairwise work is quadratic only WITHIN clusters,
    // which the banding already bounded. Typicality sums 6dp-rounded
    // jaccards through DECIMAL so partition order is unobservable;
    // the oracle replays pairs, propagation rounds, within-cluster
    // jaccard and the argmax.
    Q(
      "d25_medoid_survivor",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        val clusters = Dedup.labelPropagationClusters(pairs, iterations = 3)
        val sh = toks.select($"id",
            array_distinct(Dedup.shingles($"tokens", 3)).as("sh"))
          .filter(size($"sh") > 0)
        val m = clusters.join(sh, Seq("id")).persist()
        val pw = m.as("x").join(m.as("y"),
            $"x.cluster" === $"y.cluster" && $"x.id" =!= $"y.id")
          .select($"x.cluster".as("cluster"), $"x.id".as("id"),
            round(Dedup.jaccard($"x.sh", $"y.sh"), 6).as("j"))
        val typ = pw.groupBy($"cluster", $"id")
          .agg(sum($"j".cast("decimal(38,6)")).cast("double").as("typ"),
            count(lit(1)).as("n_others"))
        typ.groupBy($"cluster")
          .agg(max(struct($"typ", (-$"id").as("nid"), $"id",
            $"n_others")).as("m"),
            (count(lit(1))).as("n_members"))
          .select($"cluster", $"m.id".as("medoid_id"), $"n_members",
            round($"m.typ", 6).as("typicality"))
          .orderBy($"cluster")
      },
      Some {
        val rounds = (1 to 3).map { k =>
          s"""l$k AS (SELECT n.id, least(n.lbl, coalesce(min(l.lbl), n.lbl)) AS lbl
             |  FROM l${k - 1} n
             |  LEFT JOIN e2 ON e2.dst = n.id
             |  LEFT JOIN l${k - 1} l ON l.id = e2.src
             |  GROUP BY n.id, n.lbl)""".stripMargin
        }.mkString(",\n")
        s"""WITH $minhashPairCtes,
           |p2 AS (SELECT a, b FROM jac WHERE j >= 0.3),
           |e2 AS (SELECT a AS src, b AS dst FROM p2
           |  UNION ALL SELECT b AS src, a AS dst FROM p2),
           |l0 AS (SELECT DISTINCT dst AS id, dst AS lbl FROM e2),
           |$rounds,
           |cl AS (SELECT id, lbl AS cluster FROM l3),
           |mm AS (SELECT cl.id, cl.cluster, s.sh
           |  FROM cl JOIN s ON s.id = cl.id),
           |pw AS (SELECT cluster, id, round(iw * 1.0 / (la + lb - iw), 6) AS j
           |  FROM (SELECT x.cluster, x.id,
           |      len(list_intersect(x.sh, y.sh)) AS iw,
           |      len(x.sh) AS la, len(y.sh) AS lb
           |    FROM mm x JOIN mm y
           |      ON x.cluster = y.cluster AND x.id <> y.id)),
           |typ AS (SELECT cluster, id,
           |  CAST(sum(CAST(j AS DECIMAL(38,6))) AS DOUBLE) AS typ,
           |  count(*) AS n_others
           |  FROM pw GROUP BY cluster, id),
           |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
           |  ORDER BY typ DESC, id) AS rn,
           |  count(*) OVER (PARTITION BY cluster) AS n_members
           |  FROM typ)
           |SELECT cluster, id AS medoid_id,
           |  CAST(n_members AS BIGINT) AS n_members,
           |  round(typ, 6) AS typicality
           |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin
      }),

    // Incremental delta-vs-base LSH probe — the steady-state ingest
    // shape: every 7th doc arrives as the "delta" shard and probes the
    // band index of the rest. Only the delta shuffles per ingest.
    // Oracle: the shared band chain (per-doc signatures are independent
    // of the corpus split — the FNV gram hash never depended on the
    // vocabulary), split AFTER banding by the same id rule.
    Q(
      "d26_incremental_lsh",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.incrementalNearDuplicates(
          baseToks = toks.filter($"id" % 7 =!= 0),
          deltaToks = toks.filter($"id" % 7 === 0),
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.3)
          .orderBy($"id")
      },
      Some(
        s"""WITH $minhashBandCtes,
           |baseb AS MATERIALIZED (SELECT * FROM bands WHERE id % 7 <> 0),
           |deltab AS (SELECT * FROM bands WHERE id % 7 = 0),
           |sizedb AS (SELECT id, band, key FROM (SELECT id, band, key,
           |    count(*) OVER (PARTITION BY band, key) AS bn FROM baseb)
           |  WHERE bn <= 1000),
           |cand AS MATERIALIZED (SELECT DISTINCT d.id AS did, b.id AS bid
           |  FROM deltab d JOIN sizedb b
           |    ON d.band = b.band AND d.key = b.key),
           |hits AS MATERIALIZED (SELECT did, bid,
           |    iw * 1.0 / (la + lb - iw) AS j FROM (
           |  SELECT c.did, c.bid, len(list_intersect(sa.sh, sb.sh)) AS iw,
           |    len(sa.sh) AS la, len(sb.sh) AS lb
           |  FROM cand c JOIN s sa ON sa.id = c.did JOIN s sb ON sb.id = c.bid)
           |  WHERE iw * 1.0 / (la + lb - iw) >= 0.3),
           |agg AS (SELECT did, count(*) AS n_matches, max(j) AS bj
           |  FROM hits GROUP BY did),
           |best AS (SELECT h.did, a.n_matches, min(h.bid) AS best_base,
           |    round(a.bj, 6) AS best_j
           |  FROM hits h JOIN agg a ON h.did = a.did AND h.j = a.bj
           |  GROUP BY h.did, a.n_matches, a.bj)
           |SELECT s.id, coalesce(b.n_matches, 0) AS n_matches,
           |  b.best_base, b.best_j
           |FROM s LEFT JOIN best b ON b.did = s.id
           |WHERE s.id % 7 = 0 ORDER BY s.id""".stripMargin)),

    // Content-defined chunking + chunk-level dedup (LBFS/FastCDC
    // family): boundaries after every 8-char window with
    // fnv1a64 % 64 == 0 — offset-shift-proof, memoryless, hash-for-hash
    // replayed in SQL. Bounded to a doc slice at gate scale (the
    // per-char fingerprint replay is the oracle's cost, not the
    // operator's — the Spark path is one narrow expression chain plus
    // a linear chunk-hash groupBy and runs unbounded in the stress
    // tier).
    Q(
      "d27_cdc_chunks",
      (s, dir) => {
        import s.implicits._
        Dedup.cdcChunkDedup(
          Tables.documents(s, dir).filter($"doc_id" < 300),
          "doc_id", "text", window = 8, mask = 63)
          .orderBy($"id")
      },
      Some {
        // NOTE the fingerprint lambda var must not be `i`: FnvSql's
        // inner byte loop binds `i` itself and would shadow it.
        val fp = FnvSql.ofString("substr(t, p, 8)")
        s"""WITH d AS (SELECT doc_id AS id, text AS t FROM documents
           |  WHERE doc_id < 300 AND length(text) >= 1),
           |ends AS (SELECT id, t, list_sort(list_distinct(list_concat(
           |    CASE WHEN length(t) >= 8 THEN
           |      list_filter(list_transform(range(1, length(t) - 6),
           |        p -> CASE WHEN ($fp) % 64 = 0 THEN p + 7 END),
           |        x -> x IS NOT NULL)
           |    ELSE [] END,
           |    [length(t)]))) AS es FROM d),
           |src AS (SELECT id, unnest(list_transform(range(1, len(es) + 1),
           |    k -> struct_pack(
           |      ch := md5(substr(t, CASE WHEN k = 1 THEN 1 ELSE es[k-1] + 1 END,
           |        es[k] - (CASE WHEN k = 1 THEN 1 ELSE es[k-1] + 1 END) + 1)),
           |      clen := es[k] - (CASE WHEN k = 1 THEN 1 ELSE es[k-1] + 1 END) + 1)))
           |  AS u FROM ends),
           |ch AS MATERIALIZED (SELECT id, u.ch AS ch, u.clen AS clen FROM src),
           |dup AS (SELECT ch FROM (SELECT ch, count(*) AS cnt FROM ch
           |  GROUP BY ch) WHERE cnt >= 2)
           |SELECT c.id, count(*) AS n_chunks,
           |  CAST(sum(CASE WHEN d.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
           |  CAST(sum(CASE WHEN d.ch IS NOT NULL THEN c.clen ELSE 0 END) AS BIGINT) AS dup_chars,
           |  round(sum(CASE WHEN d.ch IS NOT NULL THEN c.clen ELSE 0 END)
           |    * 1.0 / sum(c.clen), 6) AS dup_frac
           |FROM ch c LEFT JOIN dup d USING (ch)
           |GROUP BY c.id ORDER BY c.id""".stripMargin
      }),

    // Winnowing fingerprint overlap (Schleimer et al. 2003 / MOSS):
    // the PARTIAL-overlap detector — selected-minima fingerprints
    // guarantee any shared run of >= w+k-1 = 15 normalized chars
    // produces a shared fingerprint, at ~2/(w+1) retention. Pairs
    // sharing >= 8 fingerprints (the planted-duplicate tail starts ~22
    // at sf0.01; incidental 2-3-shared pairs are corpus noise and grow
    // with SF), scored by containment-style overlap.
    // The oracle replays gram hashing per DISTINCT gram (one FNV fold
    // each), rebuilds the per-doc hash sequence, and runs the identical
    // rightmost-min window scan as a list_reduce.
    Q(
      "d28_winnowing",
      (s, dir) => {
        import s.implicits._
        val fp = graft.operators.Winnowing.fingerprints(
          graft.Par.fanOut(Tables.documents(s, dir)), "doc_id", "text",
          k = 8, w = 8)
        graft.operators.Winnowing.overlapPairs(fp, minShared = 8, dfCap = 50)
          .orderBy($"a", $"b")
      },
      Some(s"""WITH nd AS (SELECT doc_id AS id,
              |  lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS nrm
              |  FROM documents),
              |nd2 AS (SELECT id, nrm FROM nd WHERE length(nrm) >= 15),
              |g AS (SELECT id, i AS pos, substr(nrm, i + 1, 8) AS gr
              |  FROM (SELECT id, nrm, unnest(range(length(nrm) - 7)) AS i
              |    FROM nd2)),
              |vg AS (SELECT DISTINCT gr FROM g),
              |gh AS MATERIALIZED (SELECT gr,
              |  ${FnvSql.toSigned(FnvSql.ofString("gr"))} AS h FROM vg),
              |hsa AS MATERIALIZED (SELECT id, list(h ORDER BY pos) AS hs
              |  FROM g JOIN gh USING (gr) GROUP BY id),
              |sel AS (SELECT id, hs,
              |  list_distinct(list_transform(range(len(hs) - 7), j ->
              |    list_reduce(range(j, j + 8), (acc, i) ->
              |      CASE WHEN hs[i + 1] <= hs[acc + 1] THEN i ELSE acc END)))
              |    AS ps
              |  FROM hsa),
              |fp AS (SELECT DISTINCT id, hs[p + 1] AS h
              |  FROM (SELECT id, hs, unnest(ps) AS p FROM sel)),
              |hcnt AS (SELECT h, count(*) AS ndoc FROM fp GROUP BY h),
              |capped AS (SELECT fp.id, fp.h FROM fp JOIN hcnt USING (h)
              |  WHERE ndoc <= 50),
              |nfp AS (SELECT id, count(*) AS nf FROM fp GROUP BY id),
              |pr AS (SELECT x.id AS a, y.id AS b, count(*) AS n_shared
              |  FROM capped x JOIN capped y ON x.h = y.h AND x.id < y.id
              |  GROUP BY 1, 2)
              |SELECT a, b, n_shared,
              |  round(n_shared * 1.0 / least(na.nf, nb.nf), 6) AS overlap
              |FROM pr JOIN nfp na ON na.id = a JOIN nfp nb ON nb.id = b
              |WHERE n_shared >= 8 ORDER BY a, b""".stripMargin)),

    // 2-core of the d04 near-dup pair graph (Seidman 1983 k-core via
    // Batagelj-Zaveršnik peeling, 4 fixed rounds): the density
    // skeleton — template/boilerplate families survive the peel,
    // incidental one-off matches don't. Complements d07/d18 (WHICH
    // component) with HOW DENSE; a curation pass treats core members
    // as systematic duplication worth a rule, peeled nodes as noise.
    // Oracle: the shared minhash pair replay + 4 unrolled peel CTEs.
    Q(
      "d29_kcore",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        val pairs = Dedup.minhashNearDuplicates(toks, shingleN = 3,
          numHashes = 32, bands = 8, threshold = 0.3)
        Dedup.kCore(pairs, k = 2, rounds = 4).orderBy($"id")
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""a$r AS (SELECT ed.src AS id FROM ed
             |  JOIN a${r - 1} ax ON ed.src = ax.id
             |  JOIN a${r - 1} ay ON ed.dst = ay.id
             |  GROUP BY ed.src HAVING count(*) >= 2)""".stripMargin
        }.mkString(",\n")
        s"""WITH $minhashPairCtes,
           |pr AS (SELECT a, b FROM jac WHERE j >= 0.3),
           |ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM pr
           |  UNION ALL SELECT b AS src, a AS dst FROM pr),
           |d0 AS (SELECT src AS id, count(*) AS degree0 FROM ed
           |  GROUP BY src),
           |a0 AS (SELECT id FROM d0 WHERE degree0 >= 2),
           |$rounds
           |SELECT d0.id, d0.degree0, a4.id IS NOT NULL AS in_core
           |FROM d0 LEFT JOIN a4 ON a4.id = d0.id
           |ORDER BY d0.id""".stripMargin
      }),

    // Analytic LSH parameter planner: for every (bands b, rows r) split
    // of the 32-hash signature, the collision S-curve is
    // P(s) = 1 − (1 − s^r)^b; the planner integrates the false-positive
    // area below the target threshold t=0.3 and the false-negative area
    // above it (midpoint rule, 200 points — deterministic) and flags
    // the split minimizing total error. The ANALYTIC side of s13's
    // EMPIRICAL band-layout sweep: s13 measures recall on this corpus,
    // d30 says what the theory picks before any data is scanned — at
    // 100 TB you run d30 first and s13 on a sample to confirm.
    Q(
      "d30_lsh_plan",
      (s, dir) => {
        import s.implicits._
        val confs = s.createDataFrame(Seq((32, 1), (16, 2), (8, 4),
            (4, 8), (2, 16), (1, 32))).toDF("bands", "rows_per_band")
        val t = 0.3
        val scored = confs
          .crossJoin(s.range(200).select(
            (($"id" + lit(0.5)) / 200.0).as("s")))
          .select($"bands", $"rows_per_band", $"s",
            (lit(1.0) - pow(lit(1.0) - pow($"s", $"rows_per_band"),
              $"bands")).as("p"))
          .groupBy($"bands", $"rows_per_band")
          .agg(
            round(sum(when($"s" < t, $"p").otherwise(0.0)) / 200.0, 6)
              .as("fp_area"),
            round(sum(when($"s" >= t, lit(1.0) - $"p").otherwise(0.0))
              / 200.0, 6).as("fn_area"))
          .select($"bands", $"rows_per_band",
            round(pow(lit(1.0) / $"bands",
              lit(1.0) / $"rows_per_band"), 6).as("s_star"),
            $"fp_area", $"fn_area",
            round($"fp_area" + $"fn_area", 6).as("total_err"))
        val best = scored.agg(min(struct($"total_err", $"bands")).as("m"))
          .select($"m.total_err".as("be"), $"m.bands".as("bb"))
        scored.crossJoin(broadcast(best))
          .select($"bands", $"rows_per_band", $"s_star", $"fp_area",
            $"fn_area", $"total_err",
            ($"total_err" === $"be" && $"bands" === $"bb").as("chosen"))
          .orderBy($"bands")
      },
      Some("""WITH confs AS (SELECT b.bands, 32 // b.bands AS rows_per_band
             |  FROM (SELECT unnest([32, 16, 8, 4, 2, 1]) AS bands) b),
             |pts AS (SELECT bands, rows_per_band,
             |  (i + 0.5) / 200.0 AS s
             |  FROM confs CROSS JOIN (SELECT unnest(range(200)) AS i)),
             |pc AS (SELECT bands, rows_per_band, s,
             |  1.0 - pow(1.0 - pow(s, rows_per_band), bands) AS p FROM pts),
             |sc AS (SELECT bands, rows_per_band,
             |  round(sum(CASE WHEN s < 0.3 THEN p ELSE 0.0 END) / 200.0, 6)
             |    AS fp_area,
             |  round(sum(CASE WHEN s >= 0.3 THEN 1.0 - p ELSE 0.0 END)
             |    / 200.0, 6) AS fn_area
             |  FROM pc GROUP BY bands, rows_per_band),
             |sc2 AS (SELECT bands, rows_per_band,
             |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s_star,
             |  fp_area, fn_area,
             |  round(fp_area + fn_area, 6) AS total_err FROM sc),
             |best AS (SELECT min(struct_pack(te := total_err, b := bands))
             |  AS m FROM sc2)
             |SELECT s.bands, s.rows_per_band, s.s_star, s.fp_area,
             |  s.fn_area, s.total_err,
             |  (s.total_err = best.m.te AND s.bands = best.m.b) AS chosen
             |FROM sc2 s CROSS JOIN best ORDER BY s.bands""".stripMargin))
  )

  /** d20 + sm19 shared oracle: the exact-substring cut replay —
    * the batch query and the stream-cut topology must produce
    * exactly this table.
    */
  private[queries] lazy val spanRemovalOracleSql: String =
    """WITH g AS (SELECT doc_id, i, md5(substr(text, i, 40)) AS gh
      |  FROM documents, unnest(range(1, length(text)-38)) AS t(i)
      |  WHERE length(text) >= 40),
      |c AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |d AS (SELECT doc_id, i FROM g JOIN c USING (gh)),
      |m AS (SELECT doc_id, i,
      |  CASE WHEN i > coalesce(lag(i) OVER (PARTITION BY doc_id
      |    ORDER BY i), -39) + 39 THEN 1 ELSE 0 END AS st FROM d),
      |isl AS (SELECT doc_id, i,
      |  sum(st) OVER (PARTITION BY doc_id ORDER BY i) AS grp FROM m),
      |sp AS (SELECT doc_id, min(i) AS s, max(i) + 39 AS e
      |  FROM isl GROUP BY doc_id, grp),
      |seg AS (SELECT doc_id, s, e,
      |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
      |    AS pe FROM sp),
      |agg AS (SELECT seg.doc_id,
      |  string_agg(substr(t.text, seg.pe + 1, seg.s - seg.pe - 1),
      |    '' ORDER BY seg.s) AS head,
      |  max(seg.e) AS last_e,
      |  CAST(count(*) AS BIGINT) AS n_spans,
      |  CAST(sum(seg.e - seg.s + 1) AS BIGINT) AS n_cut
      |  FROM seg JOIN documents t USING (doc_id)
      |  GROUP BY seg.doc_id)
      |SELECT d0.doc_id,
      |  coalesce(a.n_spans, 0) AS n_spans,
      |  coalesce(a.n_cut, 0) AS n_cut,
      |  CASE WHEN a.doc_id IS NULL THEN d0.text
      |    ELSE coalesce(a.head, '') || substr(d0.text, a.last_e + 1)
      |  END AS clean_text
      |FROM documents d0 LEFT JOIN agg a USING (doc_id)
      |ORDER BY d0.doc_id""".stripMargin

  /** d21 + sm18 shared oracle: the Fellegi-Sunter linkage replay —
    * both the batch query and the stream-scored topology must produce
    * exactly this table.
    */
  private[queries] lazy val linkageOracleSql: String =
    """WITH a AS (SELECT c_custkey AS a_key, c_name, c_nationkey,
      |  c_acctbal, c_mktsegment FROM customer),
      |b AS (SELECT c_custkey AS b_key, substr(c_name, 1, 16) AS nm16,
      |  c_nationkey, round(c_acctbal, -2) AS bal100,
      |  c_mktsegment AS segb FROM customer),
      |p AS (SELECT a_key, b_key,
      |  substr(c_name, 1, 16) = nm16 AS agree_name,
      |  abs(c_acctbal - bal100) <= 50.0 AS agree_bal,
      |  c_mktsegment = segb AS agree_seg
      |  FROM a JOIN b USING (c_nationkey)),
      |u AS (SELECT avg(CAST(agree_name AS DOUBLE)) AS un,
      |  avg(CAST(agree_bal AS DOUBLE)) AS ub,
      |  avg(CAST(agree_seg AS DOUBLE)) AS us
      |  FROM p WHERE a_key <> b_key),
      |uc AS (SELECT least(greatest(un, 1e-6), 0.999999) AS un,
      |  least(greatest(ub, 1e-6), 0.999999) AS ub,
      |  least(greatest(us, 1e-6), 0.999999) AS us FROM u),
      |w AS (SELECT a_key, b_key, agree_name, agree_bal, agree_seg,
      |  round(
      |    CASE WHEN agree_name THEN round(ln(0.95 / un), 6)
      |      ELSE round(ln((CAST(1 AS DOUBLE) - 0.95)
      |        / (CAST(1 AS DOUBLE) - un)), 6) END
      |  + CASE WHEN agree_bal THEN round(ln(0.9 / ub), 6)
      |      ELSE round(ln((CAST(1 AS DOUBLE) - 0.9)
      |        / (CAST(1 AS DOUBLE) - ub)), 6) END
      |  + CASE WHEN agree_seg THEN round(ln(0.95 / us), 6)
      |      ELSE round(ln((CAST(1 AS DOUBLE) - 0.95)
      |        / (CAST(1 AS DOUBLE) - us)), 6) END, 6) AS score
      |  FROM p, uc),
      |r AS (SELECT *, row_number() OVER (PARTITION BY a_key
      |  ORDER BY score DESC, b_key) AS rnk FROM w)
      |SELECT a_key, b_key, agree_name, agree_bal, agree_seg, score
      |FROM r WHERE rnk = 1 AND score > 0 ORDER BY a_key""".stripMargin

  /** d14 oracle: the same blocked sorted-neighborhood windows — leads
    * 1..5 over (block, skey-sorted) order, stacked and thresholded on
    * the 6dp-rounded exact Jaccard.
    */
  private lazy val d14OracleSql: String = {
    val leads = (1 to 5).map(i =>
      s"lead(doc_id, $i) OVER w AS b$i, lead(sh, $i) OVER w AS shb$i")
      .mkString(",\n  ")
    val stacked = (1 to 5).map(i =>
      s"SELECT doc_id AS ida, sh AS sha, b$i AS idb, shb$i AS shb FROM l WHERE b$i IS NOT NULL")
      .mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT doc_id,
       |  regexp_extract_all(lower(text),'[a-zA-Z]+') AS tk FROM documents),
       |s AS (SELECT doc_id, tk[1] AS block,
       |  array_to_string(tk[1:3], ' ') AS skey,
       |  list_distinct(list_transform(range(1, len(tk)-1),
       |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |  FROM t WHERE len(tk) >= 3),
       |l AS (SELECT doc_id, sh,
       |  $leads
       |  FROM s WINDOW w AS (PARTITION BY block ORDER BY skey, doc_id)),
       |p AS ($stacked),
       |j AS (SELECT least(ida, idb) AS a, greatest(ida, idb) AS b,
       |  round(len(list_intersect(sha, shb)) * 1.0
       |    / (len(sha) + len(shb) - len(list_intersect(sha, shb))), 6) AS jaccard
       |  FROM p)
       |SELECT a, b, jaccard FROM j WHERE jaccard >= 0.05
       |ORDER BY a, b""".stripMargin
  }
}
