package graft.queries

/** DuckDB replay of the [[graft.lsa.PowerCore]] k-concept implicit-
  * deflation recurrence, unrolled as materialized CTE blocks — the SQL
  * side of the exact-decimal discipline documented on PowerCore (every
  * matvec/dot/correction sum runs in DECIMAL(38,18) and is cast back to
  * DOUBLE at the same points the engine does).
  *
  * The chain is KEYED: every CTE carries a group column `g`, so the same
  * builder serves the ungrouped queries (ls01/ls02 set g = '' in their
  * `cells` CTE) and the per-group summarizers (ls04/ls05 key by source).
  * Scalar steps (norms, σ, dots) become per-g tables; argmax picks
  * become per-g window ranks.
  *
  * Every generated CTE name — and the `cells` / `nsent` input names —
  * takes an optional `p` prefix, so one query can host several
  * independent chains (ls05 runs the system TF-IDF chain and the
  * baseline binary chain side by side).
  *
  * Caller supplies a preceding CTE `{p}cells(g, id, token, a)`;
  * [[chain]] appends the CTEs and exposes per concept j ∈ 1..k:
  *   {p}cv{j}(g, token, v)  — converged right vector,
  *   {p}av{j}(g, id, av)    — A·v (u = av/σ),
  *   {p}sg{j}(g, sigma)     — singular value,
  *   {p}fl{j}(g, fl)        — ±1 sign making the max-|v| loading
  *                            positive (Q9/H2, ties to lowest token).
  */
private[queries] object PowerKSql {

  private val Dec = "DECIMAL(38,18)"

  private def mv(p: String, out: String, in: String, byCol: String,
      otherCol: String, valIn: String, valOut: String): String =
    s"""$out AS MATERIALIZED (SELECT g, $byCol,
       |  CAST(sum(CAST(a * $valIn AS $Dec)) AS DOUBLE) AS $valOut
       |  FROM ${p}cells JOIN $in USING (g, $otherCol) GROUP BY g, $byCol)""".stripMargin

  // zero-norm residual -> ZERO vector (PowerCore's zero-continue
  // convention for rank-deficient groups, e.g. k above a tiny group's rank)
  private def normPair(w: String, n: String, v: String): String =
    s"""$n AS MATERIALIZED (SELECT g, sqrt(CAST(sum(CAST(w * w AS $Dec))
       |  AS DOUBLE)) AS nrm FROM $w GROUP BY g),
       |$v AS MATERIALIZED (SELECT g, token,
       |  CASE WHEN nrm = 0.0 THEN 0.0 ELSE w / nrm END AS v
       |  FROM $w JOIN $n USING (g))""".stripMargin

  /** The k-concept chain (requires preceding {p}cells(g,id,token,a)). */
  def chain(k: Int, iters: Int, p: String = ""): String = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    blocks += s"""${p}pcnv AS (SELECT g, count(DISTINCT token) AS nv
                 |  FROM ${p}cells GROUP BY g),
                 |${p}pc0 AS (SELECT g, 1.0 / sqrt(nv * 1.0) AS c0 FROM ${p}pcnv)""".stripMargin
    for (j <- 1 to k) {
      val c = s"${p}c$j"
      if (j == 1) {
        blocks += s"""${c}v0 AS (SELECT t.g, t.token, c.c0 AS v
                     |  FROM (SELECT DISTINCT g, token FROM ${p}cells) t
                     |  JOIN ${p}pc0 c ON c.g = t.g)""".stripMargin
      } else {
        // union of prior (σ², v) pairs feeding the deflation terms
        val vp = (1 until j).map(i =>
          s"""SELECT $i AS i, c.g, sigma * sigma AS s2, token, v
             |  FROM ${p}cv$i c JOIN ${p}sg$i USING (g)""".stripMargin)
          .mkString("\nUNION ALL\n")
        blocks += s"${p}vp$j AS MATERIALIZED (\n$vp)"
        // init: uniform orthogonalized against all priors, normalized
        blocks += s"""${c}d0 AS MATERIALIZED (SELECT vp.g, i,
                     |  CAST(sum(CAST(v * c0 AS $Dec)) AS DOUBLE) AS dot
                     |  FROM ${p}vp$j vp JOIN ${p}pc0 USING (g) GROUP BY vp.g, i),
                     |${c}r0 AS MATERIALIZED (SELECT vp.g, token,
                     |  CAST(sum(CAST(dot * v AS $Dec)) AS DOUBLE) AS corr
                     |  FROM ${p}vp$j vp JOIN ${c}d0 USING (g, i) GROUP BY vp.g, token),
                     |${c}i0 AS (SELECT r.g, token, c0 - corr AS w
                     |  FROM ${c}r0 r JOIN ${p}pc0 USING (g))""".stripMargin
        blocks += normPair(s"${c}i0", s"${c}n0", s"${c}v0")
      }
      for (i <- 1 to iters) {
        blocks += mv(p, s"${c}u$i", s"${c}v${i - 1}", "id", "token", "v", "u")
        blocks += mv(p, s"${c}wr$i", s"${c}u$i", "token", "id", "u", "w")
        if (j == 1)
          blocks += normPair(s"${c}wr$i", s"${c}n$i", s"${c}v$i")
        else {
          blocks += s"""${c}d$i AS MATERIALIZED (SELECT p.g, p.i, p.s2,
                       |  CAST(sum(CAST(p.v * q.v AS $Dec)) AS DOUBLE) AS dot
                       |  FROM ${p}vp$j p JOIN ${c}v${i - 1} q
                       |    ON q.g = p.g AND q.token = p.token
                       |  GROUP BY p.g, p.i, p.s2),
                       |${c}c$i AS MATERIALIZED (SELECT p.g, p.token,
                       |  CAST(sum(CAST((p.s2 * d.dot) * p.v AS $Dec)) AS DOUBLE) AS corr
                       |  FROM ${p}vp$j p JOIN ${c}d$i d ON d.g = p.g AND d.i = p.i
                       |  GROUP BY p.g, p.token),
                       |${c}w$i AS (SELECT a.g, a.token, a.w - b.corr AS w
                       |  FROM ${c}wr$i a JOIN ${c}c$i b
                       |    ON b.g = a.g AND b.token = a.token)""".stripMargin
          blocks += normPair(s"${c}w$i", s"${c}n$i", s"${c}v$i")
        }
      }
      blocks += s"${p}cv$j AS (SELECT g, token, v FROM ${c}v$iters)"
      blocks += mv(p, s"${p}av$j", s"${p}cv$j", "id", "token", "v", "av")
      blocks += s"""${p}sg$j AS MATERIALIZED (SELECT g,
                   |  sqrt(CAST(sum(CAST(av * av AS $Dec)) AS DOUBLE)) AS sigma
                   |  FROM ${p}av$j GROUP BY g)""".stripMargin
      blocks += s"""${p}fl$j AS (SELECT g, fl FROM (SELECT g,
                   |  CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS fl,
                   |  row_number() OVER (PARTITION BY g
                   |    ORDER BY abs(v) DESC, token) AS rn FROM ${p}cv$j)
                   |  WHERE rn = 1)""".stripMargin
    }
    blocks.mkString(",\n")
  }

  /** KEYED Ozsoy cross-method scoring over the chain output (mirrors
    * OzsoyPowerSummarizer.scoreSentences): requires the chain CTEs plus
    * a caller-provided `{p}nsent(g, n)` — the TOTAL sentence count per
    * group (zero-token sentences included, like the dense matrix's zero
    * columns). Emits `{p}sct(g, sid, score)` for sentences present in
    * the matrix; callers LEFT JOIN and coalesce absent ones to 0.
    */
  def ozsoyScoreCtes(k: Int, p: String = "",
      sigmaThreshold: String = "0.75"): String = {
    val sigt = (1 to k).map(i => s"SELECT g, $i AS j, sigma FROM ${p}sg$i")
      .mkString(" UNION ALL ")
    val svt = (1 to k).map(i =>
      s"SELECT g, $i AS j, token AS sid, fl * v AS sv FROM ${p}cv$i JOIN ${p}fl$i USING (g)")
      .mkString("\nUNION ALL\n")
    s"""${p}sigt AS ($sigt),
       |${p}smaxt AS (SELECT g, max(sigma) AS smax FROM ${p}sigt GROUP BY g),
       |${p}svt AS (\n$svt),
       |${p}avgt AS (SELECT g, j,
       |  CAST(sum(CAST(sv AS $Dec)) AS DOUBLE) / n AS avg
       |  FROM ${p}svt JOIN ${p}nsent USING (g) GROUP BY g, j, n),
       |${p}sigk AS (SELECT g, j,
       |  CASE WHEN sigma >= $sigmaThreshold * smax THEN sigma ELSE 0.0 END AS sig
       |  FROM ${p}sigt JOIN ${p}smaxt USING (g)),
       |${p}cutt AS (SELECT g, j, sid,
       |  CASE WHEN sv > avg THEN sv ELSE 0.0 END AS vcut
       |  FROM ${p}svt JOIN ${p}avgt USING (g, j)),
       |${p}sct AS (SELECT g, sid, CAST(sum(CAST((sig * vcut) * (sig * vcut)
       |    AS $Dec)) AS DOUBLE) AS score
       |  FROM ${p}cutt JOIN ${p}sigk USING (g, j) GROUP BY g, sid)""".stripMargin
  }

  /** ls01-style per-concept emission (ungrouped — g is constant): one
    * row per concept with σ round-4 and the top-k keyword/doc strings.
    */
  def conceptEmission(k: Int, nKeywords: Int, nDocs: Int,
      p: String = ""): String = {
    val per = (1 to k).map { j =>
      s"""SELECT ${j - 1} AS concept, round(sigma, 4) AS singular_value,
         |  kw AS keywords, dc AS doc_ids
         |FROM ${p}sg$j
         |CROSS JOIN (SELECT string_agg(token, ' ' ORDER BY sv DESC, token) AS kw
         |  FROM (SELECT token, fl * v AS sv FROM ${p}cv$j JOIN ${p}fl$j USING (g)
         |        ORDER BY sv DESC, token LIMIT $nKeywords)) kwt
         |CROSS JOIN (SELECT string_agg(CAST(id AS VARCHAR), ' '
         |    ORDER BY su DESC, id) AS dc
         |  FROM (SELECT id, CASE WHEN sigma = 0.0 THEN 0.0
         |          ELSE fl * (av / sigma) END AS su
         |        FROM ${p}av$j JOIN ${p}sg$j USING (g) JOIN ${p}fl$j USING (g)
         |        ORDER BY su DESC, id LIMIT $nDocs)) dct""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$per\n) ORDER BY concept"
  }
}
