package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the scoring function
  * behind the t09 inverted index (Robertson/Spärck Jones; the Lucene
  * `+1` idf form so scores stay positive for terms in most docs).
  *
  * Scale shape: term frequencies come from one explode + hash-agg
  * keyed on (doc, term) FILTERED to the query's terms at the scan (the
  * filter pushes inside the explode projection, so the shuffle carries
  * only matching postings — at 100 TB the wire cost is the query's
  * posting lists, not the corpus). Document frequencies and corpus
  * stats are tiny aggregates broadcast back. Per-document scores are
  * assembled by pivoting each term's contribution into a COLUMN and
  * adding in fixed term order — IEEE-deterministic regardless of
  * partitioning (a float `sum()` over an unordered group would not be).
  */
object Bm25 {

  /** Per-document BM25 scores for `terms` over (idCol, tokens).
    * Output: (doc_id, dl, c_<term>... rounded 6dp, score) — score is
    * the fixed-order sum of the rounded per-term contributions; only
    * documents containing at least one query term appear.
    */
  def score(docs: DataFrame, idCol: String, tokens: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val base = docs.select(col(idCol).as("doc_id"), tokens.as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    // One-row corpus stats (N, Σdl) — exact integer sums, so avgdl is
    // bit-identical however the corpus is partitioned.
    val corpus = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      // Bounded by the query's posting lists (docs containing a query
      // term × |terms|), and referenced by BOTH the df aggregate and the
      // scoring join — without the persist each reference replays the
      // corpus explode (the plan audit showed 6 corpus scans; now 2:
      // one for corpus stats, one for the postings).
      .persist()
    val dfT = tf.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf
      .join(broadcast(dfT), Seq("tok"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    val contribCols = terms.map(t =>
      round(coalesce(max(when(col("tok") === t, col("contrib"))), lit(0.0)), 6)
        .as(s"c_$t"))
    val piv = scored.groupBy(col("doc_id"), col("dl"))
      .agg(contribCols.head, contribCols.tail: _*)
    piv.withColumn("score",
      round(terms.map(t => col(s"c_$t")).reduce(_ + _), 6))
  }
}
