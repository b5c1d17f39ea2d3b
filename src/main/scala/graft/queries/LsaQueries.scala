package graft.queries

import org.apache.spark.sql.functions._

import graft.baseline.OzsoyLsaSummarizer
import graft.lsa.Lsa
import graft.tables.Tables

/** LSA concept extraction + the pytldr-equivalent baseline (EP1/V1).
  * SVD factors are not SQL-expressible, so these are rows-only checks;
  * determinism comes from the Q9 sign convention and pinned vocabulary
  * order, asserted in unit tests.
  */
object LsaQueries extends QueryProvider {

  override val all: Seq[Q] = Seq(

    Q(
      "ls01_concepts",
      (s, dir) => {
        import s.implicits._
        Lsa.concepts(Tables.documents(s, dir), "doc_id", "text")
          .select($"concept",
            round($"singular_value", 4).as("singular_value"),
            concat_ws(" ", $"keywords").as("keywords"),
            concat_ws(" ", $"doc_ids").as("doc_ids"))
          .orderBy($"concept")
      },
      None,
      bench = true),

    Q(
      "ls02_baseline_scores",
      (s, dir) => {
        import s.implicits._
        // V1 is a driver-local per-document baseline by design; the
        // "document" here is the ordered en-corpus slice.
        val sents = Tables.documents(s, dir)
          .filter($"lang" === "en" && $"doc_id" < 200)
          .orderBy($"doc_id")
          .select($"text").as[String].collect().toSeq
        val scored = OzsoyLsaSummarizer.scoreSentences(sents)
        s.createDataFrame(scored.map(x => (x.index, math.rint(x.score * 1e6) / 1e6)))
          .toDF("sent_idx", "score")
          .orderBy($"sent_idx")
      },
      None),

    // Per-group (per-source) extractive top-k in one flatMapGroups job —
    // one local SVD per bounded group, no driver loop. Rows-only (SVD).
    Q(
      "ls04_grouped_topk",
      (s, dir) => {
        import s.implicits._
        val sents = Tables.documents(s, dir)
          .select($"source".as("grp"), $"doc_id".as("sid"), $"text")
        graft.operators.GroupedSummarizer.topKPerGroup(sents, 3)
          .toDF()
          .select($"grp", $"sid", $"score")
          .orderBy($"grp", $"sid")
      },
      None),

    // EP3 at scale: per-source system-vs-baseline ROUGE table in ONE
    // flatMapGroups job (no driver loop). Rows-only (SVD inside);
    // GroupedEvalSpec asserts equality with Pipelines.evaluate.
    Q(
      "ls05_grouped_eval",
      (s, dir) => {
        import s.implicits._
        val sents = Tables.documents(s, dir)
          .select($"source".as("grp"), $"doc_id".cast("string").as("review_id"),
            lit(0).as("sent_idx"), $"text".as("sentence"))
        graft.operators.GroupedSummarizer.evaluatePerGroup(sents).toDF()
          .select($"product_id", $"metric",
            round($"precision", 6).as("precision"),
            round($"recall", 6).as("recall"),
            round($"f1", 6).as("f1"))
          .orderBy($"product_id", $"metric")
      },
      None),

    Q(
      "ls03_baseline_summary",
      (s, dir) => {
        import s.implicits._
        val sents = Tables.documents(s, dir)
          .filter($"lang" === "en" && $"doc_id" < 200)
          .orderBy($"doc_id")
          .select($"text").as[String].collect().toSeq
        val summary = OzsoyLsaSummarizer.summarize(sents, topics = 15,
          length = 15, topicSigmaThreshold = 0.75)
        s.createDataFrame(summary.zipWithIndex.map(_.swap))
          .toDF("pos", "sentence").orderBy($"pos")
      },
      None)
  )
}
