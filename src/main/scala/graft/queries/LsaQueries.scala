package graft.queries

import org.apache.spark.sql.functions._

import graft.baseline.OzsoyPowerSummarizer
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

  /** ls01 gate shape: k concepts, top-3 keywords / docs each.
    * (All gate parameters sit BEFORE `all` — the oracle strings are
    * built eagerly at object init.)
    */
  private val K = 5
  private val NKw = 3
  private val NDoc = 3

  /** Deflation depth for the Ozsoy power queries (see
    * OzsoyPowerSummarizer: the 0.75 σ-threshold keeps the surviving set
    * well inside 5 concepts — OzsoyPowerSpec asserts it on gate data).
    */
  private val OzsoyTopics = 5

  override val all: Seq[Q] = Seq(

    // The reference's k=5 LSA concept table (BigdataProjectCode.py:138)
    // as a fully DuckDB-replayed query: the TF-IDF matrix (lemma'd LSA
    // token pipeline, quirk Q3 idf) factored by the PowerCore implicit-
    // deflation recurrence — the k-concept generalization of ls06/ls07.
    // The production ARPACK solver stays a first-class path as
    // ls08_concepts_arpack (below), which cross-gates against LAPACK
    // in-query; PowerLsaSpec ties the two families together.
    Q(
      "ls01_concepts",
      (s, dir) => {
        import s.implicits._
        PowerLsa.kConcepts(powerCells(s, dir, lemma = true), K, PowerIters,
            NKw, NDoc)
          .orderBy($"concept")
      },
      Some(ls01OracleSql)),

    // The production-solver sibling: distributed ARPACK SVD
    // (IndexedRowMatrix.computeSVD — the path a 100 TB corpus calls),
    // gated IN-QUERY cell-for-cell against the driver-local LAPACK
    // mirror (LocalLsa) whenever the corpus is small enough to collect:
    // σ within 1e-3 relative and identical keyword/doc selections, or
    // the query throws and the gate records a failure. Rows-only at the
    // DuckDB layer by nature of the solver; the k=5 semantics themselves
    // are hash-verified via ls01's power twin.
    Q(
      "ls08_concepts_arpack",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val out = Lsa.concepts(docs, "doc_id", "text")
        val nDocs = docs.count()
        if (nDocs <= 10000L) { // bounded verification collect
          val local = graft.lsa.LocalLsa.concepts(
            docs.select($"doc_id".cast("long"), $"text")
              .as[(Long, String)].collect().toSeq.sortBy(_._1))
          val dist = out.orderBy($"concept").collect()
          require(dist.length == local.length,
            s"ARPACK returned ${dist.length} concepts, LAPACK ${local.length}")
          dist.zip(local.sortBy(_.concept)).foreach { case (r, lc) =>
            val sd = r.getAs[Double]("singular_value")
            require(math.abs(sd - lc.singularValue) <=
                1e-3 * math.max(1.0, math.abs(lc.singularValue)),
              s"concept ${lc.concept}: ARPACK sigma $sd vs LAPACK ${lc.singularValue}")
            require(r.getAs[Seq[String]]("keywords") == lc.keywords,
              s"concept ${lc.concept}: keyword sets diverge")
            require(r.getAs[Seq[Long]]("doc_ids") == lc.docIds,
              s"concept ${lc.concept}: doc selections diverge")
          }
        }
        out.select($"concept",
            round($"singular_value", 4).as("singular_value"),
            concat_ws(" ", $"keywords").as("keywords"),
            concat_ws(" ", $"doc_ids").as("doc_ids"))
          .orderBy($"concept")
      },
      None,
      bench = true),

    // The pytldr-equivalent baseline (V1/H3) in its DuckDB-replayable
    // configuration: the Ozsoy cross-method over a PowerCore-factored
    // binary matrix (OzsoyPowerSummarizer doc). V1 is a driver-local
    // per-document baseline by design; the "document" here is the
    // ordered en-corpus slice. The LAPACK/topics=15 parity anchor stays
    // OzsoyLsaSummarizer + OzsoySpec/AnchorSpec/OzsoyPowerSpec.
    Q(
      "ls02_baseline_scores",
      (s, dir) => {
        import s.implicits._
        val sents = baselineSents(s, dir)
        val scored = OzsoyPowerSummarizer.scoreSentences(
          sents, OzsoyTopics, PowerIters)
        s.createDataFrame(scored.map(x =>
            (x.index.toLong, OzsoyPowerSummarizer.round6(x.score))))
          .toDF("sent_idx", "score")
          .orderBy($"sent_idx")
      },
      Some(s"""$ozsoyChainSql
             |SELECT sid AS sent_idx, round(score, 6) AS score
             |FROM scall ORDER BY sent_idx""".stripMargin)),

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
        val sents = baselineSents(s, dir)
        val summary = OzsoyPowerSummarizer.summarize(sents, length = 15,
          OzsoyTopics, PowerIters)
        s.createDataFrame(summary).toDF("pos", "sentence").orderBy($"pos")
      },
      Some(s"""$ozsoyChainSql,
             |sel AS (SELECT sid FROM scall ORDER BY score DESC, sid LIMIT 15)
             |SELECT row_number() OVER (ORDER BY sid) - 1 AS pos,
             |  text AS sentence
             |FROM sents JOIN sel USING (sid) ORDER BY pos""".stripMargin)),

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
        PowerLsa.topSingular(powerCells(s, dir), iters = PowerIters)
          .orderBy($"kind", $"ident")
      },
      Some(powerOracleSql(PowerIters))),

    // Second concept via IMPLICIT deflation — A₂ᵀA₂ = AᵀA − σ₁²v₁v₁ᵀ,
    // so the residual never densifies: each round is the same two
    // sparse matvecs plus a dot product and a rank-1 correction on the
    // vocabulary-sized vector. The oracle replays BOTH concepts
    // (concept 1's chain feeds σ₁ and v₁) — a two-factor SVD, fully
    // hash-checked.
    Q(
      "ls07_power_concept2",
      (s, dir) => {
        import s.implicits._
        PowerLsa.secondSingular(powerCells(s, dir), iters = PowerIters)
          .orderBy($"kind", $"ident")
      },
      Some(secondOracleSql(PowerIters)))
  )

  /** The V1 baseline's input: the ordered en-corpus slice. */
  private def baselineSents(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"lang" === "en" && $"doc_id" < 200)
      .orderBy($"doc_id")
      .select($"text").as[String].collect().toSeq
  }

  /** Shared ls02/ls03 oracle prefix: sentence slice → binary matrix →
    * PowerKSql chain → cross-method scores, ending in
    * scall(sid, score) over ALL sentences (zero-token ones score 0).
    */
  private def ozsoyChainSql: String = {
    val j = 1 to OzsoyTopics
    val sigt = j.map(i => s"SELECT $i AS j, sigma FROM sg$i").mkString(" UNION ALL ")
    val svt = j.map(i =>
      s"SELECT $i AS j, token AS sid, fl * v AS sv FROM cv$i JOIN fl$i USING (g)")
      .mkString("\nUNION ALL\n")
    s"""WITH sents AS (SELECT row_number() OVER (ORDER BY doc_id) - 1 AS sid, text
       |  FROM documents WHERE lang = 'en' AND doc_id < 200),
       |tokrows AS (SELECT sid, unnest(list_distinct(list_filter(
       |    regexp_extract_all(lower(text), '[a-zA-Z]+'),
       |    x -> NOT list_contains(${TextQueries.stopSql}, x)))) AS term
       |  FROM sents),
       |cells AS MATERIALIZED (SELECT '' AS g, term AS id, sid AS token, 1.0 AS a
       |  FROM tokrows),
       |${PowerKSql.chain(OzsoyTopics, PowerIters)},
       |sigt AS ($sigt),
       |smaxt AS (SELECT max(sigma) AS smax FROM sigt),
       |svt AS (\n$svt),
       |nsent AS (SELECT count(*) AS n FROM sents),
       |avgt AS (SELECT j, CAST(sum(CAST(sv AS DECIMAL(38,18))) AS DOUBLE) / n AS avg
       |  FROM svt CROSS JOIN nsent GROUP BY j, n),
       |sigk AS (SELECT j, CASE WHEN sigma >= 0.75 * smax THEN sigma ELSE 0.0 END AS sig
       |  FROM sigt CROSS JOIN smaxt),
       |cutt AS (SELECT j, sid, CASE WHEN sv > avg THEN sv ELSE 0.0 END AS vcut
       |  FROM svt JOIN avgt USING (j)),
       |sct AS (SELECT sid, CAST(sum(CAST((sig * vcut) * (sig * vcut)
       |    AS DECIMAL(38,18))) AS DOUBLE) AS score
       |  FROM cutt JOIN sigk USING (j) GROUP BY sid),
       |scall AS (SELECT s.sid, coalesce(sct.score, 0.0) AS score
       |  FROM sents s LEFT JOIN sct ON sct.sid = s.sid)""".stripMargin
  }

  /** The t05-style TF-IDF cell matrix the power queries factor (ls06/
    * ls07 take the raw-token form; ls01 the lemma'd LSA pipeline).
    */
  private def powerCells(s: org.apache.spark.sql.SparkSession, dir: String,
      lemma: Boolean = false) = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    val tok = graft.Par.fanOut(docs)
      .select($"doc_id", TF.lsaTokens($"text", lemma).as("tokens"))
    val tf = TfIdf.termFrequencies(tok, "doc_id", "tokens")
    val idf = TfIdf.idfTable(tf, "doc_id", n)
    tf.join(broadcast(idf.select($"token", $"idf")), "token")
      .select($"doc_id".as("id"), $"token", round($"tf" * $"idf", 6).as("a"))
  }

  /** DuckDB replay of ls01: lemma'd TF-IDF cells (morphy in SQL, as in
    * tr03/t07) → PowerKSql k-concept chain → concept emission.
    */
  private def ls01OracleSql: String =
    s"""WITH RECURSIVE
       |d0 AS (SELECT doc_id, ${TextQueries.tokSql()} AS t0 FROM documents),
       |tokrows AS (SELECT doc_id, unnest(t0) AS tok FROM d0),
       |toks AS (SELECT DISTINCT tok FROM tokrows),
       |${MorphySql.ctes},
       |ltok AS (SELECT tr.doc_id, l.lemma AS token
       |  FROM tokrows tr JOIN lem l ON l.tok = tr.tok),
       |ltf AS (SELECT doc_id, token, count(*) AS tf
       |  FROM ltok GROUP BY doc_id, token),
       |ldf AS (SELECT token, count(*) AS df FROM ltf GROUP BY token),
       |nn AS (SELECT count(*) AS n FROM documents),
       |cells AS MATERIALIZED (SELECT '' AS g, doc_id AS id, ltf.token,
       |  round(ltf.tf * log10(nn.n * 1.0 / ldf.df), 6) AS a
       |  FROM ltf JOIN ldf USING (token) CROSS JOIN nn),
       |${PowerKSql.chain(K, PowerIters)}
       |${PowerKSql.conceptEmission(K, NKw, NDoc)}""".stripMargin

  // AS MATERIALIZED throughout: without it DuckDB inlines every CTE
  // reference and the iteration chain re-evaluates `cells` exponentially.
  private def mvSql(out: String, grp: String, other: String, vin: String,
      vcol: String, ocol: String): String =
    s"""$out AS MATERIALIZED (SELECT $grp, CAST(sum(CAST(a * $vcol AS DECIMAL(38,18)))
       |    AS DOUBLE) AS $ocol
       |  FROM cells JOIN $vin USING ($other) GROUP BY $grp)""".stripMargin

  /** Concept-1 chain `cells, nv, v0 … v<iters>` (shared by ls06/ls07). */
  private def powerChainCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      Seq(
        mvSql(s"u$i", "id", "token", s"v${i - 1}", "v", "u"),
        mvSql(s"w$i", "token", "id", s"u$i", "u", "w"),
        s"""nrm$i AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18)))
           |    AS DOUBLE)) AS nrm FROM w$i)""".stripMargin,
        s"v$i AS MATERIALIZED (SELECT token, w / nrm AS v FROM w$i CROSS JOIN nrm$i)"
      ).mkString(",\n")
    }
    s"""tok AS (SELECT doc_id, unnest(${TextQueries.tokSql()}) AS token
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
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Emit (kind, ident, score) for a final vector CTE `vf`. */
  private def emitSql(vf: String, avName: String, sgName: String): String =
    s"""$avName AS MATERIALIZED (SELECT id,
       |  CAST(sum(CAST(a * v AS DECIMAL(38,18))) AS DOUBLE) AS av
       |  FROM cells JOIN $vf USING (token) GROUP BY id),
       |$sgName AS (SELECT sqrt(CAST(sum(CAST(av * av AS DECIMAL(38,18))) AS DOUBLE))
       |  AS sigma FROM $avName)
       |SELECT kind, ident, score FROM (
       |  SELECT 'sigma' AS kind, '' AS ident, round(sigma, 6) AS score FROM $sgName
       |  UNION ALL
       |  SELECT 'term', token, round(v, 6) FROM $vf
       |  UNION ALL
       |  SELECT 'doc', id::VARCHAR, round(av / sigma, 6)
       |  FROM $avName CROSS JOIN $sgName)
       |ORDER BY kind, ident""".stripMargin

  /** DuckDB replay of [[PowerLsa.topSingular]] over the same TF-IDF
    * cells: the `iters` rounds are unrolled as CTE pairs with the exact
    * decimal summation discipline of the engine.
    */
  private def powerOracleSql(iters: Int): String =
    s"""WITH ${powerChainCtes(iters)},
       |${emitSql(s"v$iters", "av", "sg")}""".stripMargin

  /** DuckDB replay of [[PowerLsa.secondSingular]]: concept-1 chain,
    * σ₁²/v₁, deflated-init q0, then `iters` deflated rounds.
    */
  private def secondOracleSql(iters: Int): String = {
    val v1 = s"v$iters"
    val rounds = (1 to iters).map { i =>
      Seq(
        mvSql(s"qu$i", "id", "token", s"q${i - 1}", "v", "u"),
        mvSql(s"qw0$i", "token", "id", s"qu$i", "u", "w0"),
        s"""qd$i AS MATERIALIZED (SELECT CAST(sum(CAST(a1.v * b.v AS DECIMAL(38,18)))
           |    AS DOUBLE) AS dot
           |  FROM $v1 a1 JOIN q${i - 1} b USING (token))""".stripMargin,
        s"""qw$i AS MATERIALIZED (SELECT a1.token,
           |    coalesce(w0, 0.0) - ((s2 * dot) * a1.v) AS w
           |  FROM $v1 a1 LEFT JOIN qw0$i USING (token)
           |  CROSS JOIN qd$i CROSS JOIN s2c)""".stripMargin,
        s"""qnrm$i AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18)))
           |    AS DOUBLE)) AS nrm FROM qw$i)""".stripMargin,
        s"q$i AS MATERIALIZED (SELECT token, w / nrm AS v FROM qw$i CROSS JOIN qnrm$i)"
      ).mkString(",\n")
    }
    s"""WITH ${powerChainCtes(iters)},
       |av1 AS MATERIALIZED (SELECT id,
       |  CAST(sum(CAST(a * v AS DECIMAL(38,18))) AS DOUBLE) AS av
       |  FROM cells JOIN $v1 USING (token) GROUP BY id),
       |sg1 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(av * av AS DECIMAL(38,18)))
       |  AS DOUBLE)) AS sigma FROM av1),
       |s2c AS MATERIALIZED (SELECT sigma * sigma AS s2 FROM sg1),
       |dot0 AS MATERIALIZED (SELECT CAST(sum(CAST(v * (1.0 / sqrt(nv * 1.0))
       |    AS DECIMAL(38,18))) AS DOUBLE) AS dot
       |  FROM $v1 CROSS JOIN nv),
       |q0r AS MATERIALIZED (SELECT token,
       |    (1.0 / sqrt(nv * 1.0)) - (dot * v) AS w
       |  FROM $v1 CROSS JOIN nv CROSS JOIN dot0),
       |qnrm0 AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(w * w AS DECIMAL(38,18)))
       |  AS DOUBLE)) AS nrm FROM q0r),
       |q0 AS MATERIALIZED (SELECT token, w / nrm AS v FROM q0r CROSS JOIN qnrm0),
       |${rounds.mkString(",\n")},
       |${emitSql(s"q$iters", "av2", "sg2")}""".stripMargin
  }
}
