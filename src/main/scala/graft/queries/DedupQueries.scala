package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.tables.Tables
import graft.text.{TextFunctions => TF}

/** Deduplication coverage over `documents` + `embeddings` (SURVEY §7.5).
  * Exact hashing, brute-force n-gram Jaccard and embedding-cosine
  * near-dup all carry DuckDB oracles; the MinHash-LSH and SimHash paths
  * hash with xxhash64/murmur3 (no DuckDB equivalent) and are rows-only —
  * their recall against the brute-force truth is unit-tested instead.
  */
object DedupQueries extends QueryProvider {

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
             |SELECT a.doc_id AS a, b.doc_id AS b,
             |round(len(list_intersect(a.sh, b.sh)) * 1.0
             |  / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE len(list_intersect(a.sh, b.sh)) * 1.0
             |  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.05
             |ORDER BY a, b""".stripMargin)),

    // MinHash-LSH near-dup (the 100 TB path; rows-only — hash family not
    // reproducible in SQL; recall vs d03 unit-tested).
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
      None,
      bench = true),

    // SimHash near-dup (rows-only).
    Q(
      "d05_simhash_neardup",
      (s, dir) => {
        import s.implicits._
        val toks = graft.Par.fanOut(Tables.documents(s, dir))
          .select($"doc_id".as("id"), TF.tokenize($"text").as("tokens"))
        Dedup.simhashNearDuplicates(toks, maxHamming = 3)
          .orderBy($"a", $"b")
      },
      None),

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
             |ORDER BY a, b""".stripMargin))
  )
}
