package graft.textrank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** TextRank (Mihalcea & Tarau 2004) re-expressed as declarative DataFrame
  * plans — SURVEY.md §2.9 (G1-G7) / EP2.
  *
  * Reference semantics reproduced exactly (BigdataProjectCode.py):
  *  - similarity `|set-intersect| / (log2(|a|) + log2(|b|) + 1)` where the
  *    lengths count duplicates but the intersection is set-based (:339-347,
  *    quirk in SURVEY G2);
  *  - self/zero-similarity edges dropped (:342-347, F8);
  *  - rank init 0.15 (not 1/N), damping 0.85, fixed 5 iterations, update
  *    `r' = 0.15 + 0.85 * Σ_in rank_src * w / Σ_out w_src` (:386-391, Q4);
  *  - vertices with an empty token list are excluded (log2(0) is undefined
  *    — the reference would crash on them; F7).
  *
  * Scale design: the all-pairs similarity join (J2) is the quadratic
  * step. Here it is a broadcast-nested-loop self-join, correct and fast
  * while the vertex set (sentence band survivors) fits a broadcast; the
  * 100 TB path swaps `similarityEdges` for the MinHash-LSH prefilter in
  * `graft.operators.Dedup` (same edge schema) so the rank loop — two
  * shuffles per iteration, lineage cut by localCheckpoint — is unchanged.
  */
object TextRank {

  final case class Config(
      iterations: Int = 5,
      damping: Double = 0.85,
      initRank: Double = 0.15,
      minWords: Int = 10,
      maxWords: Int = 30,
      lemma: Boolean = true)

  /** G2 edge weight between two token arrays. */
  def similarity(a: Column, b: Column): Column =
    size(array_intersect(array_distinct(a), array_distinct(b))).cast("double") /
      (log2(size(a)) + log2(size(b)) + lit(1.0))

  /** Directed edge list (src, dst, weight) over all ordered pairs with
    * nonzero similarity (both directions present — the graph is
    * symmetric, matching the reference's adjacency map).
    *
    * vertices: (id: long, tokens: array<string>), tokens non-empty.
    */
  def similarityEdges(vertices: DataFrame): DataFrame = {
    val a = vertices.select(col("id").as("src"), col("tokens").as("toks_a"))
    val b = vertices.select(col("id").as("dst"), col("tokens").as("toks_b"))
    a.join(broadcast(b), col("src") =!= col("dst"))
      .withColumn("weight", similarity(col("toks_a"), col("toks_b")))
      .filter(col("weight") =!= 0.0)
      .select("src", "dst", "weight")
  }

  /** Iterative rank propagation (G4-G6). Returns (id, rnk). */
  def ranks(edges: DataFrame, cfg: Config = Config()): DataFrame = {
    val spark = edges.sparkSession
    // normalize out-weights once: wn = w / Σ_out w(src)
    val outSum = edges.groupBy(col("src")).agg(sum(col("weight")).as("ow"))
    val norm = edges.join(outSum, "src")
      .select(col("src"), col("dst"), (col("weight") / col("ow")).as("wn"))
      .persist()
    norm.count() // materialize once; reused every iteration

    var r = norm.select(col("src").as("id")).distinct()
      .withColumn("rnk", lit(cfg.initRank))
    for (_ <- 1 to cfg.iterations) {
      r = norm.join(r, norm("src") === r("id"))
        .groupBy(col("dst"))
        .agg((lit(cfg.initRank) + lit(cfg.damping) * sum(col("rnk") * col("wn"))).as("rnk"))
        .select(col("dst").as("id"), col("rnk"))
        // cut lineage each round or the plan doubles per iteration (H5)
        .localCheckpoint()
    }
    norm.unpersist()
    r
  }

  /** Full document-level pipeline over a (id, text) DataFrame: band filter
    * F2 on raw space-split words, token pipeline, edges, ranks.
    */
  def rankDocuments(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val vertices = docs
      .filter(TextFunctions.spaceWordCount(col(textCol)) > cfg.minWords &&
        TextFunctions.spaceWordCount(col(textCol)) < cfg.maxWords)
      .select(col(idCol).as("id"),
        TextFunctions.textrankTokens(col(textCol), cfg.lemma).as("tokens"))
      .filter(size(col("tokens")) > 0)
    ranks(similarityEdges(vertices), cfg)
  }

  /** G7: top-k by rank with text recovered via an equi-join (not the
    * reference's per-winner `lookup()` jobs — SURVEY §4.1 anti-pattern).
    */
  def summarize(docs: DataFrame, idCol: String, textCol: String, k: Int,
      cfg: Config = Config()): DataFrame = {
    val r = rankDocuments(docs, idCol, textCol, cfg)
      .withColumn("rnk", round(col("rnk"), 6))
      .orderBy(desc("rnk"), col("id"))
      .limit(k)
    r.join(docs.select(col(idCol).as("id"), col(textCol)), "id")
      .orderBy(desc("rnk"), col("id"))
  }
}
