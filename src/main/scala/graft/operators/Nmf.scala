package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** Nonnegative matrix factorization of the TF-IDF doc×term matrix by
  * Lee–Seung multiplicative updates (NIPS 2000) — the classic
  * deterministic topic extractor: V ≈ W·H with W (doc×k) and H
  * (k×term) elementwise nonnegative,
  *
  *   W ← W ∘ (V Hᵀ) ⊘ (W·(H Hᵀ) + ε)
  *   H ← H ∘ (Wᵀ V) ⊘ ((Wᵀ W)·H + ε)     (H's update uses the NEW W)
  *
  * run for a FIXED number of rounds from an FNV-seeded init, so the
  * factorization is a pure function of the corpus (no RNG) and a SQL
  * oracle replays every round.
  *
  * Determinism: all matrix entries live as 6dp DECIMALs; every matrix
  * product is a sum of exact DECIMAL products (partition-order-proof),
  * rounded back to 6dp after the divide. The only floats are the
  * per-entry multiply/divide, written with identical association in
  * both engines.
  *
  * Scale shape: H and the k×k Gram matrices are vocabulary-/k-bounded
  * — broadcast; W is doc-sized and stays distributed. Per round: one
  * broadcast join V⋈H grouped by (doc, topic), one broadcast Gram
  * join on W, one shuffle-join V⋈W grouped by (topic, term) — the
  * corpus-sized V is touched twice per round, never self-joined.
  */
object Nmf {

  /** Banded TF-IDF matrix (doc_id, term, v): v = round(tf·ln(N/df), 6)
    * over terms with df ≤ maxDfFrac·N (stopword band dropped).
    */
  def tfidf(docs: DataFrame, maxDfFrac: Double = 0.5): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(graft.text.TextFunctions.tokenize(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .filter(col("df") <= col("n_docs") * maxDfFrac)
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .cast("decimal(18,6)").as("v"))
  }

  /** FNV-seeded init in (0, 1]: ((fnv1a(key) mod 1000) + 1) / 1000. */
  private def init(key: org.apache.spark.sql.Column) =
    ((pmod(Fnv.fnv1a64(key), lit(1000L)) + 1).cast("double") / 1000.0)
      .cast("decimal(18,6)")

  /** One multiplicative factor: round(x·num/(den+ε), 6) as DECIMAL. */
  private def stepped(x: String, num: String, den: String) =
    round(col(x).cast("double") * col(num).cast("double") /
      (col(den).cast("double") + 1e-9), 6).cast("decimal(18,6)")

  /** Run `rounds` update rounds at rank k. Returns (W (doc_id, topic,
    * w), H (topic, term, h)), both 6dp DECIMAL.
    */
  def factorize(v: DataFrame, k: Int, rounds: Int): (DataFrame, DataFrame) = {
    val spark = v.sparkSession
    import spark.implicits._
    val vp = v.persist()
    val topics = spark.range(k).select($"id".cast("int").as("topic"))
    var w = vp.select($"doc_id").distinct()
      .crossJoin(broadcast(topics))
      .select($"doc_id", $"topic",
        init(concat($"doc_id".cast("string"), lit(":"),
          $"topic".cast("string"))).as("w"))
      .localCheckpoint()
    var h = vp.select($"term").distinct()
      .crossJoin(broadcast(topics))
      .select($"topic", $"term",
        init(concat($"term", lit(":"), $"topic".cast("string"))).as("h"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      // ---- W update (uses current H) ----
      val g = h.as("a").join(h.as("b"), "term")
        .groupBy($"a.topic".as("t1"), $"b.topic".as("t2"))
        .agg(round(sum($"a.h" * $"b.h").cast("double"), 6)
          .cast("decimal(18,6)").as("g"))
      val numW = vp.join(broadcast(h), Seq("term"))
        .groupBy($"doc_id", $"topic")
        .agg(round(sum($"v" * $"h").cast("double"), 6)
          .cast("decimal(18,6)").as("num"))
      val denW = w.join(broadcast(g), $"topic" === $"t1")
        .groupBy($"doc_id", $"t2")
        .agg(round(sum($"w" * $"g").cast("double"), 6)
          .cast("decimal(18,6)").as("den"))
        .withColumnRenamed("t2", "topic")
      w = w.join(numW, Seq("doc_id", "topic"), "left")
        .join(denW, Seq("doc_id", "topic"))
        .select($"doc_id", $"topic",
          // defensive: a (doc, topic) with no numW row scores 0
          coalesce(stepped("w", "num", "den"),
            lit(0).cast("decimal(18,6)")).as("w"))
        .localCheckpoint()
      // ---- H update (uses the NEW W) ----
      val f = w.as("a").join(w.as("b"), "doc_id")
        .groupBy($"a.topic".as("t1"), $"b.topic".as("t2"))
        .agg(round(sum($"a.w" * $"b.w").cast("double"), 6)
          .cast("decimal(18,6)").as("f"))
      val numH = vp.join(w, Seq("doc_id"))
        .groupBy($"topic", $"term")
        .agg(round(sum($"v" * $"w").cast("double"), 6)
          .cast("decimal(18,6)").as("num"))
      val denH = h.join(broadcast(f), $"topic" === $"t1")
        .groupBy($"t2", $"term")
        .agg(round(sum($"h" * $"f").cast("double"), 6)
          .cast("decimal(18,6)").as("den"))
        .withColumnRenamed("t2", "topic")
      h = h.join(numH, Seq("topic", "term"))
        .join(denH, Seq("topic", "term"))
        .select($"topic", $"term",
          stepped("h", "num", "den").as("h"))
        .localCheckpoint()
    }
    (w, h)
  }

  /** Per-document topic mixture from W: dominant topic (argmax weight,
    * lowest-topic tiebreak) and its share of the document's total topic
    * mass — (doc_id, topic, share). The total is a DECIMAL-exact sum of
    * the k 6dp weights, so the share is partition-order-proof; an
    * all-zero row (a doc the updates zeroed out) reports share 0.
    */
  def topicMixture(w: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = w.groupBy(col("doc_id")).agg(sum(col("w")).as("s"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("w").desc, col("topic"))
    w.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .join(tot, Seq("doc_id"))
      .select(col("doc_id"), col("topic"),
        round(when(col("s").cast("double") === 0.0, 0.0)
          .otherwise(col("w").cast("double") / col("s").cast("double")), 6)
          .as("share"))
  }

  /** Per-topic top-n terms: (topic, rnk, term, weight). */
  def topTerms(h: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("topic"))
      .orderBy(col("h").desc, col("term"))
    h.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= n)
      .select(col("topic"), col("rnk"), col("term"),
        col("h").cast("double").as("weight"))
  }
}
