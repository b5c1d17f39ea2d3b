package graft.lsa

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration power method for the TOP singular
  * triple (σ₁, u₁, v₁) of a sparse (id × token) matrix — the
  * oracle-replicable sibling of [[Lsa]]'s ARPACK SVD, the same move
  * that made the IVF quantizer verifiable (`Similarity.lloydClusters`):
  * replace the solver whose float internals no SQL engine can replay
  * with a fixed declarative recurrence whose every value is a pure
  * function of the data.
  *
  *  - init: v₀ = 1/√|vocab| on every term (the matrix is nonnegative —
  *    tf·idf with idf = log10(N/df) ≥ 0 — so by Perron-Frobenius the
  *    top singular vector is nonnegative: no sign ambiguity, and the
  *    all-ones start has positive overlap with it);
  *  - `iters` rounds of v ← AᵀA v / ‖AᵀA v‖;
  *  - σ = ‖A v‖, u = A v / σ.
  *
  * Float discipline (the whole point): every matvec sum runs in EXACT
  * decimal — per-cell products are doubles (bit-identical cross-engine
  * given identical inputs), summed as DECIMAL(38,18) (associative, so
  * partitioning cannot reorder anything observable) and cast back.
  * Norms are √(exact sum of squares); sqrt and division are IEEE
  * correctly-rounded, so both engines walk the same bit sequence.
  * Cell values themselves must be pinned upstream (round tf·idf before
  * calling — log10 is the one non-correctly-rounded step).
  *
  * 100 TB shape: each iteration is two shuffled join+agg matvecs (the
  * classic distributed power iteration); v is vocabulary-sized and
  * broadcast; lineage is cut per round with localCheckpoint. More
  * concepts = deflation rounds (A ← A − σuvᵀ), same recurrence.
  */
object PowerLsa {

  private val Dec = "decimal(38,18)"

  /** One A v matvec: (id, u). */
  private def matvecV(c: DataFrame, v: DataFrame, out: String): DataFrame =
    c.join(v, Seq("token"))
      .groupBy(col("id"))
      .agg(sum((col("a") * col("v")).cast(Dec)).cast("double").as(out))

  /** The plain power chain v ← AᵀAv / ‖AᵀAv‖ from the uniform start. */
  private def powerV(c: DataFrame, nv: Long, iters: Int): DataFrame = {
    var v = c.select(col("token")).distinct()
      .withColumn("v", lit(1.0) / sqrt(lit(nv.toDouble)))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val u = matvecV(c, v, "u")
      val w = c.join(u, Seq("id"))
        .groupBy(col("token"))
        .agg(sum((col("a") * col("u")).cast(Dec)).cast("double").as("w"))
      val nrm = w.agg(
        sqrt(sum((col("w") * col("w")).cast(Dec)).cast("double")).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("token"), (col("w") / col("nrm")).as("v"))
        .localCheckpoint()
    }
    v
  }

  /** (kind, ident, score) output rows for a converged v: σ = ‖Av‖,
    * u = Av/σ, everything rounded to 6 decimals.
    */
  private def emit(c: DataFrame, v: DataFrame): DataFrame = {
    val av = matvecV(c, v, "av")
    val sg = av.agg(
      sqrt(sum((col("av") * col("av")).cast(Dec)).cast("double")).as("sigma"))
    val u = av.crossJoin(broadcast(sg))
      .select(col("id"), (col("av") / col("sigma")).as("u"))
    sg.select(lit("sigma").as("kind"), lit("").as("ident"),
        round(col("sigma"), 6).as("score"))
      .unionAll(v.select(lit("term").as("kind"), col("token").as("ident"),
        round(col("v"), 6).as("score")))
      .unionAll(u.select(lit("doc").as("kind"), col("id").cast("string").as("ident"),
        round(col("u"), 6).as("score")))
  }

  /** cells: (id long, token string, a double) sparse matrix entries.
    * Returns (kind, ident, score): one 'sigma' row, a 'term' row per
    * vocabulary entry (v₁ loading) and a 'doc' row per matrix row (u₁
    * loading), scores rounded to 6 decimals.
    */
  def topSingular(cells: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters $iters out of range")
    val c = cells.select(col("id"), col("token"), col("a")).persist()
    val nv = c.select(col("token")).distinct().count()
    val out = emit(c, powerV(c, nv, iters))
    c.unpersist()
    out
  }

  /** SECOND singular triple via IMPLICIT deflation: never materialize
    * the dense residual A − σ₁u₁v₁ᵀ (impossible at scale); instead use
    * A₂ᵀA₂ = AᵀA − σ₁²v₁v₁ᵀ, so each round is the same two sparse
    * matvecs plus one dot product and a rank-1 correction on the
    * vocabulary-sized vector:
    *
    *   v ← normalize( Aᵀ(A v) − σ₁²·(v₁·v)·v₁ )
    *
    * started from the uniform vector orthogonalized against v₁. Same
    * float discipline as [[topSingular]] — decimal-exact sums, pinned
    * multiplication order `(σ₁²·dot)·v₁` — so the DuckDB oracle replays
    * both concepts bit-for-bit.
    */
  def secondSingular(cells: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32, s"iters $iters out of range")
    val c = cells.select(col("id"), col("token"), col("a")).persist()
    val nv = c.select(col("token")).distinct().count()
    val v1 = powerV(c, nv, iters)
    val av1 = matvecV(c, v1, "av")
    val sigma1 = av1.agg(
      sqrt(sum((col("av") * col("av")).cast(Dec)).cast("double")))
      .head().getDouble(0)
    val s2 = sigma1 * sigma1

    def dotWithV1(v: DataFrame): DataFrame =
      v1.select(col("token"), col("v").as("v1"))
        .join(v, Seq("token"))
        .agg(sum((col("v1") * col("v")).cast(Dec)).cast("double").as("dot"))

    // init: uniform start orthogonalized against v₁, normalized
    val c0 = 1.0 / math.sqrt(nv.toDouble)
    val dot0 = v1.agg(
      sum((col("v") * lit(c0)).cast(Dec)).cast("double").as("dot"))
    val q0raw = v1.crossJoin(broadcast(dot0))
      .select(col("token"), (lit(c0) - col("dot") * col("v")).as("w"))
    val nrm0 = q0raw.agg(
      sqrt(sum((col("w") * col("w")).cast(Dec)).cast("double")).as("nrm"))
    var q = q0raw.crossJoin(broadcast(nrm0))
      .select(col("token"), (col("w") / col("nrm")).as("v"))
      .localCheckpoint()

    (1 to iters).foreach { _ =>
      val u = matvecV(c, q, "u")
      val w0 = c.join(u, Seq("id"))
        .groupBy(col("token"))
        .agg(sum((col("a") * col("u")).cast(Dec)).cast("double").as("w0"))
      val dt = dotWithV1(q)
      val w = v1.select(col("token"), col("v").as("v1"))
        .join(w0, Seq("token"), "left")
        .crossJoin(broadcast(dt))
        .select(col("token"),
          (coalesce(col("w0"), lit(0.0)) -
            (lit(s2) * col("dot")) * col("v1")).as("w"))
      val nrm = w.agg(
        sqrt(sum((col("w") * col("w")).cast(Dec)).cast("double")).as("nrm"))
      q = w.crossJoin(broadcast(nrm))
        .select(col("token"), (col("w") / col("nrm")).as("v"))
        .localCheckpoint()
    }
    val out = emit(c, q)
    c.unpersist()
    out
  }
}
