package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.baseline.OzsoyLsaSummarizer

/** Distributed per-group extractive summarization: the Ozsoy/LSA scorer
  * runs INSIDE `flatMapGroups`, one local SVD per group (a group = one
  * document's sentences, or one product's reviews — always bounded), so
  * a 100 TB corpus of millions of documents summarizes in a single
  * shuffle-by-key job with no driver loop. This is the scale counterpart
  * of the reference's per-file driver iteration (SURVEY §4.1) and of
  * `Pipelines.evaluate`'s faithful but driver-looped EP3.
  */
object GroupedSummarizer {

  final case class SentenceRow(grp: String, sid: Long, text: String)
  final case class ScoredSentence(grp: String, sid: Long, score: Double, text: String)

  /** Top-k sentences per group by the Steinberger-Ježek score, emitted in
    * each group's original sentence order.
    *
    * sents: (grp string, sid long, text string).
    */
  def topKPerGroup(sents: DataFrame, k: Int, topics: Int = 15,
      sigmaThreshold: Double = 0.75): Dataset[ScoredSentence] = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.select(col("grp").cast("string"), col("sid").cast("long"),
        col("text").cast("string"))
      .as[SentenceRow]
      .groupByKey(_.grp)
      .flatMapGroups { (grp, it) =>
        // one bounded group in memory; one local SVD (no Spark jobs here)
        val rows = it.toVector.sortBy(_.sid)
        val scored = OzsoyLsaSummarizer.scoreSentences(
          rows.map(_.text), topics, sigmaThreshold)
        scored.sortBy(s => (-s.score, s.index)).take(k)
          .sortBy(_.index)
          .map(s => ScoredSentence(grp, rows(s.index).sid,
            math.rint(s.score * 1e6) / 1e6, s.sentence))
          .iterator
      }
  }
}
