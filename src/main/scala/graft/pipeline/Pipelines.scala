package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.baseline.OzsoyLsaSummarizer
import graft.io.ReviewSource
import graft.lsa.Lsa
import graft.rouge.Rouge
import graft.text.TextFunctions
import graft.textrank.TextRank

/** The reference's three entry points (SURVEY.md §3 EP1-EP3) as
  * Spark-native APIs over the review TSV input shape.
  */
object Pipelines {

  /** Sentence table with surrogate long ids for the matrix row index
    * (deterministic by (review_id, sent_idx)); F1 length filter applied.
    * Numbering is distributed: sort range-partitions the table and
    * `zipWithIndex` assigns contiguous ids per partition — no
    * single-partition global window even on multi-product input.
    */
  def sentencesWithSid(sents: DataFrame, minWords: Int = 5): DataFrame = {
    val spark = sents.sparkSession
    val sorted = sents
      .filter(TextFunctions.spaceWordCount(col("sentence")) >= minWords)
      .orderBy(col("review_id"), col("sent_idx"))
    val numbered = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(numbered,
      sorted.schema.add("sid", org.apache.spark.sql.types.LongType))
  }

  /** EP1 core — LSA summary from a sentence table.
    * Output: (concept, singular_value, keywords, sentence_ids, sentences).
    */
  def lsaSummaryFromSentences(sents0: DataFrame,
      cfg: Lsa.Config = Lsa.Config()): DataFrame = {
    val spark = sents0.sparkSession
    import spark.implicits._
    val sents = sentencesWithSid(sents0)
    val concepts = Lsa.concepts(sents, "sid", "sentence", cfg)
    concepts
      .select($"concept", $"singular_value",
        concat_ws(" ", $"keywords").as("keywords"),
        posexplode($"doc_ids").as(Seq("ord", "sid")))
      .join(sents.select($"sid", $"sentence_id", $"sentence"), "sid")
      .groupBy($"concept", $"singular_value", $"keywords")
      .agg(
        concat_ws(",", transform(array_sort(collect_list(struct($"ord", $"sentence_id"))),
          x => x.getField("sentence_id"))).as("sentence_ids"),
        concat_ws(" | ", transform(array_sort(collect_list(struct($"ord", $"sentence"))),
          x => x.getField("sentence"))).as("sentences"))
      .orderBy($"concept")
  }

  /** EP1 — LSA review summary for a product path. */
  def lsaSummary(spark: SparkSession, path: String,
      cfg: Lsa.Config = Lsa.Config()): DataFrame =
    lsaSummaryFromSentences(
      ReviewSource.sentences(ReviewSource.reviews(spark, path)), cfg)

  /** S5 report shape: the reference's printed concept report (:144-152,
    * `round(x, 2)` formatting at :399-401) as a table — presentation
    * stays a table, never a driver print. σ is formatted through
    * CAST(… AS DECIMAL(18,2)) rather than %.2f: both Spark and DuckDB
    * round the decimal cast HALF_UP and print the fixed-scale form
    * ("4.10", "5.00"), while printf-style %.2f is round-half-even in C
    * — the decimal cast is the engine-stable spelling, which is what
    * lets ls09 gate this exact string. `concept` rides along as the
    * deterministic sort key.
    */
  def conceptReport(concepts: DataFrame): DataFrame =
    concepts.select(col("concept"),
      concat(lit("Concept "), col("concept").cast("string"),
        lit(" [sigma="), col("singular_value").cast("decimal(18,2)").cast("string"),
        lit("] keywords: "), col("keywords"),
        lit(" | sentences: "), col("sentence_ids")).as("line"))

  /** EP2 — TextRank review summary: top-k sentences by rank. */
  def textrankSummary(spark: SparkSession, path: String, k: Int = 5,
      cfg: TextRank.Config = TextRank.Config()): DataFrame = {
    val sents = ReviewSource.sentences(ReviewSource.reviews(spark, path))
    TextRank.summarize(sents, "sentence_id", "sentence", k, cfg)
  }

  /** EP3 — evaluation: LSA system summary vs the Ozsoy/pytldr-style
    * baseline, zip-paired (J3: zip truncates to the shorter list) and
    * ROUGE-scored with stemming, per product. Implements the INTENDED
    * per-product comparison — not the reference's file-0 bug (quirk Q7).
    *
    * `conceptPairs = true` (default) pairs like the reference
    * (BigdataProjectCode.py:196: `zip(textSummariesConcepts, rfrncedata)`):
    * each system element is ONE CONCEPT's sentences joined, zipped against
    * single baseline sentences — the length asymmetry behind the published
    * ROUGE-L P ≪ R shape (BASELINE.md Fig-5/6). `false` pairs
    * sentence-by-sentence (symmetric lengths).
    *
    * Output: one row per product × metric with mean P/R/F (A7).
    *
    * Scale routing: the faithful per-product driver loop (pytldr-shaped,
    * one Spark job per product) runs only while the corpus is small;
    * above `groupedThreshold` products the SAME evaluation runs as ONE
    * `flatMapGroups` job ([[graft.operators.GroupedSummarizer
    * .evaluatePerGroup]] — a million corpora = one job). The two paths
    * are asserted row-equal in GroupedEvalSpec, so the routing is a pure
    * execution-strategy choice.
    */
  def evaluate(spark: SparkSession, path: String,
      topics: Int = 15, summaryLen: Int = 15,
      conceptPairs: Boolean = true,
      groupedThreshold: Int = 64): DataFrame = {
    import spark.implicits._
    val all = ReviewSource.sentences(ReviewSource.reviews(spark, path))
      .filter(length(trim(col("sentence"))) > 0)
      .persist()

    val products = all.select($"product_id").distinct()
      // collect-bound: model: distinct product ids (group domain) — the reference's per-file loop spine
      .as[String].collect().sorted.toSeq

    if (products.length > groupedThreshold) {
      val out = graft.operators.GroupedSummarizer.evaluatePerGroup(
        all.select($"product_id".as("grp"), $"review_id", $"sent_idx",
          $"sentence"),
        topics, summaryLen, conceptPairs).toDF()
      all.unpersist()
      return out
    }

    val rows = products.flatMap { pid =>
      val psents = all.filter($"product_id" === pid)
      val conceptSents = lsaSummaryFromSentences(psents)
        // collect-bound: top-k: k concept summaries for one product
        .select($"sentences").as[String].collect()
      val sys =
        if (conceptPairs) conceptSents.map(_.replace(" | ", " ")).toSeq
        else conceptSents.flatMap(_.split(" \\| ")).toSeq
      // baseline: driver-local like pytldr; one product's sentences fit
      val ordered = psents.orderBy($"review_id", $"sent_idx")
        // collect-bound: fixture: one product's sentences for the driver-local pytldr baseline (reference parity; the grouped operators are the scale route)
        .select($"sentence").as[String].collect().toSeq
      val ref = OzsoyLsaSummarizer.summarize(ordered, topics, summaryLen.toDouble)
      val pairs = sys.zip(ref)
      Seq("rouge1", "rouge2", "rougeL").map { metric =>
        val scores = pairs.map { case (s, r) =>
          metric match {
            case "rouge1" => Rouge.rougeN(s, r, 1, stem = true)
            case "rouge2" => Rouge.rougeN(s, r, 2, stem = true)
            case _ => Rouge.rougeL(s, r, stem = true)
          }
        }
        val n = math.max(scores.size, 1)
        (pid, metric,
          scores.map(_.precision).sum / n,
          scores.map(_.recall).sum / n,
          scores.map(_.f1).sum / n)
      }
    }
    all.unpersist()
    spark.createDataFrame(rows)
      .toDF("product_id", "metric", "precision", "recall", "f1")
  }
}
