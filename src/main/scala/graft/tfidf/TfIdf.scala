package graft.tfidf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF / DF / IDF / TF-IDF as distributed relational transforms
  * (SURVEY.md §2.5 A1-A4, §2.8 L1-L2).
  *
  * The reference computes per-sentence term-frequency maps
  * (BigdataProjectCode.py:77-82), a driver-side vocabulary (:120-121), a
  * dense DF vector (:123-126) and `idf = log10(N/df)` (:86-87 — quirk Q3:
  * deliberately NOT Spark ML's smoothed `ln((N+1)/(df+1))`). Here all four
  * stay distributed: explode + two hash aggregations (partial+final map-side
  * combine for free), one broadcast-join of the tiny per-term IDF table back
  * onto TF pairs. No driver materialization at any scale.
  */
object TfIdf {

  /** Per-row term-frequency MAP (the reference's `DataParser.tf` shape,
    * BigdataProjectCode.py:77-82 — A1 in map form): a one-pass native
    * expression (O(tokens), insertion-ordered).
    */
  def tfMapCol(tokens: Column): Column =
    graft.functions.TextNative.token_counts(tokens)

  /** (id, token, tf) pairs — A1. NARROW: term frequency is a per-ROW
    * quantity, so it is counted row-locally ([[tfMapCol]]) and the map
    * exploded — no shuffle at all, where the explode + groupBy(id,
    * token) form reshuffles every token occurrence. Downstream DF/IDF
    * aggregate these already-collapsed pairs (one row per (doc, term)),
    * so the whole TF-IDF build shuffles |pairs|, not |occurrences|.
    */
  def termFrequencies(tokens: DataFrame, idCol: String, tokensCol: String): DataFrame =
    tokens
      .select(col(idCol), explode(tfMapCol(col(tokensCol))))
      .select(col(idCol), col("key").as("token"),
        col("value").cast("long").as("tf"))

  /** (token, df) — A3: number of documents containing the token. */
  def docFrequencies(tf: DataFrame, idCol: String): DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Reference IDF (Q3): log10(N / df). */
  def idfCol(n: Long, df: Column): Column = log10(lit(n.toDouble) / df)

  /** (token, df, idf) from a token table. */
  def idfTable(tf: DataFrame, idCol: String, nDocs: Long): DataFrame =
    docFrequencies(tf, idCol).withColumn("idf", idfCol(nDocs, col("df")))

  /** (id, token, tf, idf, tfidf): TF pairs ⋈ broadcast IDF table (L2 as a
    * join instead of a dense elementwise product).
    */
  def tfidf(tokens: DataFrame, idCol: String, tokensCol: String, nDocs: Long): DataFrame = {
    val tf = termFrequencies(tokens, idCol, tokensCol)
    val idf = idfTable(tf, idCol, nDocs)
    tf.join(broadcast(idf), "token")
      .withColumn("tfidf", col("tf") * col("idf"))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("idf"), col("tfidf"))
  }
}
