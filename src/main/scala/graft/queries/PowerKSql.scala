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
  * Caller supplies a preceding CTE `cells(g, id, token, a)`; [[chain]]
  * appends the CTEs and exposes per concept j ∈ 1..k:
  *   cv{j}(g, token, v)  — converged right vector,
  *   av{j}(g, id, av)    — A·v (u = av/σ),
  *   sg{j}(g, sigma)     — singular value,
  *   fl{j}(g, fl)        — ±1 sign making the max-|v| loading positive
  *                         (Q9/H2 convention, ties to lowest token).
  */
private[queries] object PowerKSql {

  private val Dec = "DECIMAL(38,18)"

  private def mv(out: String, in: String, byCol: String, otherCol: String,
      valIn: String, valOut: String): String =
    s"""$out AS MATERIALIZED (SELECT g, $byCol,
       |  CAST(sum(CAST(a * $valIn AS $Dec)) AS DOUBLE) AS $valOut
       |  FROM cells JOIN $in USING (g, $otherCol) GROUP BY g, $byCol)""".stripMargin

  private def normPair(w: String, n: String, v: String): String =
    s"""$n AS MATERIALIZED (SELECT g, sqrt(CAST(sum(CAST(w * w AS $Dec))
       |  AS DOUBLE)) AS nrm FROM $w GROUP BY g),
       |$v AS MATERIALIZED (SELECT g, token, w / nrm AS v
       |  FROM $w JOIN $n USING (g))""".stripMargin

  /** The k-concept chain (requires preceding cells(g,id,token,a)). */
  def chain(k: Int, iters: Int): String = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    blocks += s"""pcnv AS (SELECT g, count(DISTINCT token) AS nv
                 |  FROM cells GROUP BY g),
                 |pc0 AS (SELECT g, 1.0 / sqrt(nv * 1.0) AS c0 FROM pcnv)""".stripMargin
    for (j <- 1 to k) {
      val p = s"c$j"
      if (j == 1) {
        blocks += s"""${p}v0 AS (SELECT t.g, t.token, c.c0 AS v
                     |  FROM (SELECT DISTINCT g, token FROM cells) t
                     |  JOIN pc0 c ON c.g = t.g)""".stripMargin
      } else {
        // union of prior (σ², v) pairs feeding the deflation terms
        val vp = (1 until j).map(i =>
          s"""SELECT $i AS i, c.g, sigma * sigma AS s2, token, v
             |  FROM cv$i c JOIN sg$i USING (g)""".stripMargin)
          .mkString("\nUNION ALL\n")
        blocks += s"vp$j AS MATERIALIZED (\n$vp)"
        // init: uniform orthogonalized against all priors, normalized
        blocks += s"""${p}d0 AS MATERIALIZED (SELECT vp.g, i,
                     |  CAST(sum(CAST(v * c0 AS $Dec)) AS DOUBLE) AS dot
                     |  FROM vp$j vp JOIN pc0 USING (g) GROUP BY vp.g, i),
                     |${p}r0 AS MATERIALIZED (SELECT vp.g, token,
                     |  CAST(sum(CAST(dot * v AS $Dec)) AS DOUBLE) AS corr
                     |  FROM vp$j vp JOIN ${p}d0 USING (g, i) GROUP BY vp.g, token),
                     |${p}i0 AS (SELECT r.g, token, c0 - corr AS w
                     |  FROM ${p}r0 r JOIN pc0 USING (g))""".stripMargin
        blocks += normPair(s"${p}i0", s"${p}n0", s"${p}v0")
      }
      for (i <- 1 to iters) {
        blocks += mv(s"${p}u$i", s"${p}v${i - 1}", "id", "token", "v", "u")
        blocks += mv(s"${p}wr$i", s"${p}u$i", "token", "id", "u", "w")
        if (j == 1)
          blocks += normPair(s"${p}wr$i", s"${p}n$i", s"${p}v$i")
        else {
          blocks += s"""${p}d$i AS MATERIALIZED (SELECT p.g, p.i, p.s2,
                       |  CAST(sum(CAST(p.v * q.v AS $Dec)) AS DOUBLE) AS dot
                       |  FROM vp$j p JOIN ${p}v${i - 1} q
                       |    ON q.g = p.g AND q.token = p.token
                       |  GROUP BY p.g, p.i, p.s2),
                       |${p}c$i AS MATERIALIZED (SELECT p.g, p.token,
                       |  CAST(sum(CAST((p.s2 * d.dot) * p.v AS $Dec)) AS DOUBLE) AS corr
                       |  FROM vp$j p JOIN ${p}d$i d ON d.g = p.g AND d.i = p.i
                       |  GROUP BY p.g, p.token),
                       |${p}w$i AS (SELECT a.g, a.token, a.w - b.corr AS w
                       |  FROM ${p}wr$i a JOIN ${p}c$i b
                       |    ON b.g = a.g AND b.token = a.token)""".stripMargin
          blocks += normPair(s"${p}w$i", s"${p}n$i", s"${p}v$i")
        }
      }
      blocks += s"cv$j AS (SELECT g, token, v FROM ${p}v$iters)"
      blocks += mv(s"av$j", s"cv$j", "id", "token", "v", "av")
      blocks += s"""sg$j AS MATERIALIZED (SELECT g,
                   |  sqrt(CAST(sum(CAST(av * av AS $Dec)) AS DOUBLE)) AS sigma
                   |  FROM av$j GROUP BY g)""".stripMargin
      blocks += s"""fl$j AS (SELECT g, fl FROM (SELECT g,
                   |  CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS fl,
                   |  row_number() OVER (PARTITION BY g
                   |    ORDER BY abs(v) DESC, token) AS rn FROM cv$j)
                   |  WHERE rn = 1)""".stripMargin
    }
    blocks.mkString(",\n")
  }

  /** ls01-style per-concept emission (ungrouped — g is constant): one
    * row per concept with σ round-4 and the top-k keyword/doc strings.
    */
  def conceptEmission(k: Int, nKeywords: Int, nDocs: Int): String = {
    val per = (1 to k).map { j =>
      s"""SELECT ${j - 1} AS concept, round(sigma, 4) AS singular_value,
         |  kw AS keywords, dc AS doc_ids
         |FROM sg$j
         |CROSS JOIN (SELECT string_agg(token, ' ' ORDER BY sv DESC, token) AS kw
         |  FROM (SELECT token, fl * v AS sv FROM cv$j JOIN fl$j USING (g)
         |        ORDER BY sv DESC, token LIMIT $nKeywords)) kwt
         |CROSS JOIN (SELECT string_agg(CAST(id AS VARCHAR), ' '
         |    ORDER BY su DESC, id) AS dc
         |  FROM (SELECT id, fl * (av / sigma) AS su
         |        FROM av$j JOIN sg$j USING (g) JOIN fl$j USING (g)
         |        ORDER BY su DESC, id LIMIT $nDocs)) dct""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$per\n) ORDER BY concept"
  }
}
