package graft.lsa

import breeze.linalg.{svd => bsvd, DenseMatrix}

import graft.SparkSpec

/** Fidelity of the GATE configuration (PowerIters = 8, the setting
  * ls01–ls05 actually run with) against a dense LAPACK SVD on the gate
  * corpus itself — closing the r5 advice gap: the convergence specs
  * exercised iters = 12/16/24 but never the iters-8 config the
  * correctness gate ships, leaving its fidelity to the reference's
  * np.linalg.svd semantics unbounded by any test.
  *
  * The contract asserted here is gap-aware, because that is the
  * mathematical content: a fixed-iteration power method converges per
  * concept at rate (σ_{j+1}/σ_j)^(2·iters), so
  *  - σ and the keyword/doc SELECTIONS must match LAPACK wherever the
  *    relative spectral gap is clear (≥ 5%);
  *  - inside a near-degenerate cluster no bounded-iteration method can
  *    separate individual vectors (sf0.1 has σ₂≈σ₃≈σ₄ within 1%) — there
  *    the assertion is the cluster-level one: every power σ lies within
  *    the cluster's LAPACK σ-range (from below: Rayleigh quotients of
  *    unit vectors never exceed σ_max and the deflated iterate stays in
  *    the orthogonal complement of the CONVERGED leaders).
  */
class PowerGateFidelitySpec extends SparkSpec {
  import spark.implicits._

  private val GateIters = 8 // must equal LsaQueries.PowerIters
  private val K = 5

  test("iters=8 matches LAPACK on the sf0.001 ls01 cells, gap-aware") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val n = docs.count()
    val tok = docs.select($"doc_id",
      graft.text.TextFunctions.lsaTokens($"text", lemma = true).as("tokens"))
    val tf = graft.tfidf.TfIdf.termFrequencies(tok, "doc_id", "tokens")
    val idf = graft.tfidf.TfIdf.idfTable(tf, "doc_id", n)
    val cells = tf.join(idf.select($"token", $"idf"), "token")
      .select($"doc_id".as("id"), $"token",
        org.apache.spark.sql.functions.round($"tf" * $"idf", 6).as("a"))
      .cache()

    val local = cells.select($"id".cast("long"), $"token", $"a".cast("double"))
      .as[(Long, String, Double)].collect()
    val ids = local.map(_._1).distinct.sorted
    val toks = local.map(_._2).distinct.sorted
    val idIdx = ids.zipWithIndex.toMap
    val tokIdx = toks.zipWithIndex.toMap
    val m = DenseMatrix.zeros[Double](ids.length, toks.length)
    local.foreach { case (i, t, a) => m(idIdx(i), tokIdx(t)) = a }
    val s = bsvd(m)

    val pow = PowerLsa.kConcepts(cells, K, GateIters, nKeywords = 3, nDocs = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2),
        r.getString(3))).sortBy(_._1)
    assert(pow.length == K)

    // LAPACK keywords/docs under the engine's exact conventions (sign:
    // max-|v| positive, tie to lexicographically-first token; order by
    // (-loading, token) / (-loading, id))
    def lapackSelections(j: Int): (Double, String, String) = {
      val vj = (0 until toks.length).map(i => s.Vt(j, i))
      val uj = (0 until ids.length).map(i => s.U(i, j))
      val tStar = toks.indices.minBy(t => (-math.abs(vj(t)), toks(t)))
      val fl = if (vj(tStar) < 0) -1.0 else 1.0
      val kw = toks.indices.map(t => (fl * vj(t), toks(t)))
        .sortBy { case (x, t) => (-x, t) }.take(3).map(_._2).mkString(" ")
      val dc = ids.indices.map(d => (fl * uj(d), ids(d)))
        .sortBy { case (x, d) => (-x, d) }.take(3).map(_._2).mkString(" ")
      (s.S(j), kw, dc)
    }

    val sig = (0 until K).map(s.S(_))
    val gapOk = (0 until K).map { j =>
      val below = if (j + 1 < sig.length) (sig(j) - sig(j + 1)) / sig(j) else 1.0
      val above = if (j > 0) (sig(j - 1) - sig(j)) / sig(j - 1) else 1.0
      math.min(below, above) >= 0.05
    }
    info(s"LAPACK spectrum: ${sig.map(x => f"$x%.4f").mkString(", ")}")
    info(s"gap-separated: ${gapOk.mkString(", ")}")

    (0 until K).foreach { j =>
      val (ls, lkw, ldc) = lapackSelections(j)
      val (_, ps, pkw, pdc) = pow(j)
      info(f"c$j lapack=$ls%.4f power=$ps%.4f kwEq=${lkw == pkw} dcEq=${ldc == pdc}")
      if (gapOk(j)) {
        // documented tolerance: round-4 output, rate bound above gives
        // ≥ (1.05)^-16 ≈ 0.46 residual mix worst-case at exactly 5%, but
        // the actual gate corpus is far better separated where gapOk —
        // 1e-3 relative holds with margin (asserted, so any data change
        // that breaks it fails loudly instead of drifting silently)
        assert(math.abs(ps - ls) <= 1e-3 * math.max(1.0, ls),
          s"concept $j sigma: power $ps vs LAPACK $ls")
        assert(pkw == lkw, s"concept $j keywords: power '$pkw' vs LAPACK '$lkw'")
        assert(pdc == ldc, s"concept $j docs: power '$pdc' vs LAPACK '$ldc'")
      } else {
        // cluster-level bound: power σ within the enclosing LAPACK range
        val lo = (j until K).map(sig(_)).min
        val hi = (0 to j).map(sig(_)).max
        assert(ps <= hi * (1.0 + 1e-6) && ps >= lo * (1.0 - 0.15),
          s"concept $j sigma $ps outside LAPACK cluster range [$lo, $hi]")
      }
    }
    cells.unpersist(): Unit
  }
}
