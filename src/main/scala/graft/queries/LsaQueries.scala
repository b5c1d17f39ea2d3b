package graft.queries

import org.apache.spark.sql.functions._

import graft.baseline.OzsoyLsaSummarizer
import graft.lsa.{Lsa, PowerLsa}
import graft.tables.Tables
import graft.text.{TextFunctions => TF}
import graft.tfidf.TfIdf

/** LSA concept extraction + the pytldr-equivalent baseline (EP1/V1).
  * SVD factors are not SQL-expressible, so these are rows-only checks;
  * determinism comes from the Q9 sign convention and pinned vocabulary
  * order, asserted in unit tests.
  */
object LsaQueries extends QueryProvider {

  /** Power-method rounds for ls06 (declared BEFORE `all` — the oracle
    * string is built eagerly at object init).
    */
  private val PowerIters = 8

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
      None),

    // The SVD family's ORACLE-CHECKED member: top singular triple of
    // the t05 TF-IDF matrix via the deterministic fixed-iteration power
    // method (PowerLsa — decimal-exact matvecs, IEEE-pinned norms,
    // cells rounded on both sides), with DuckDB unrolling the identical
    // recurrence. ls01's ARPACK path remains the production solver for
    // k concepts; PowerLsaSpec ties the two together on a fixture. This
    // closes the "SVD not SQL-expressible" gap the same way s03 closed
    // it for KMeans: make the algorithm a pure function of the data.
    Q(
      "ls06_power_concept",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val n = docs.count()
        val tok = graft.Par.fanOut(docs)
          .select($"doc_id", TF.lsaTokens($"text", lemma = false).as("tokens"))
        val tf = TfIdf.termFrequencies(tok, "doc_id", "tokens")
        val idf = TfIdf.idfTable(tf, "doc_id", n)
        val cells = tf.join(broadcast(idf.select($"token", $"idf")), "token")
          .select($"doc_id".as("id"), $"token", round($"tf" * $"idf", 6).as("a"))
        PowerLsa.topSingular(cells, iters = PowerIters)
          .orderBy($"kind", $"ident")
      },
      Some(powerOracleSql(PowerIters)))
  )

  /** DuckDB replay of [[PowerLsa.topSingular]] over the same TF-IDF
    * cells: the `iters` rounds are unrolled as CTE pairs with the exact
    * decimal summation discipline of the engine.
    */
  private def powerOracleSql(iters: Int): String = {
    // AS MATERIALIZED: without it DuckDB inlines every CTE reference,
    // and the iteration chain re-evaluates `cells` exponentially.
    def mv(out: String, grp: String, other: String, vin: String,
        vcol: String, ocol: String): String =
      s"""$out AS MATERIALIZED (SELECT $grp, CAST(sum(CAST(a * $vcol AS DECIMAL(38,18)))
         |    AS DOUBLE) AS $ocol
         |  FROM cells JOIN $vin USING ($other) GROUP BY $grp)""".stripMargin
    val rounds = (1 to iters).map { i =>
      Seq(
        mv(s"u$i", "id", "token", s"v${i - 1}", "v", "u"),
        mv(s"w$i", "token", "id", s"u$i", "u", "w"),
        s"""nrm$i AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18)))
           |    AS DOUBLE)) AS nrm FROM w$i)""".stripMargin,
        s"v$i AS MATERIALIZED (SELECT token, w / nrm AS v FROM w$i CROSS JOIN nrm$i)"
      ).mkString(",\n")
    }
    s"""WITH tok AS (SELECT doc_id, unnest(${TextQueries.tokSql()}) AS token
       |  FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
       |d AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT count(*) AS n FROM documents),
       |cells AS MATERIALIZED (SELECT doc_id AS id, tf.token,
       |    round(tf.tf * log10(n.n * 1.0 / d.df), 6) AS a
       |  FROM tf JOIN d USING (token) CROSS JOIN n),
       |nv AS (SELECT count(DISTINCT token) AS nv FROM cells),
       |v0 AS (SELECT token, 1.0 / sqrt(nv * 1.0) AS v
       |  FROM (SELECT DISTINCT token FROM cells) CROSS JOIN nv),
       |${rounds.mkString(",\n")},
       |av AS MATERIALIZED (SELECT id, CAST(sum(CAST(a * v AS DECIMAL(38,18))) AS DOUBLE) AS av
       |  FROM cells JOIN v$iters USING (token) GROUP BY id),
       |sg AS (SELECT sqrt(CAST(sum(CAST(av * av AS DECIMAL(38,18))) AS DOUBLE))
       |  AS sigma FROM av)
       |SELECT kind, ident, score FROM (
       |  SELECT 'sigma' AS kind, '' AS ident, round(sigma, 6) AS score FROM sg
       |  UNION ALL
       |  SELECT 'term', token, round(v, 6) FROM v$iters
       |  UNION ALL
       |  SELECT 'doc', id::VARCHAR, round(av / sigma, 6) FROM av CROSS JOIN sg)
       |ORDER BY kind, ident""".stripMargin
  }
}
