package graft.lsa

import java.math.{BigDecimal => JBig, RoundingMode}

/** Driver/executor-LOCAL exact-decimal power-deflation SVD core — the
  * compact sibling of [[PowerLsa]]'s distributed recurrence, and the
  * engine behind every oracle-green member of the SVD family (ls01
  * k-concepts, the ls02/ls03 Ozsoy baseline, the ls04/ls05 grouped
  * summarizers run this inside `flatMapGroups`).
  *
  * The recurrence is EXACTLY the one the DuckDB oracles unroll
  * (reference semantics: BigdataProjectCode.py:138's np.linalg.svd,
  * re-expressed as a fixed declarative recurrence — same move as ls06):
  *
  * for concept j = 1..k over cells A (id × token):
  *   v := c0 = 1/√nv uniform                    (j = 1)
  *        normalize(c0 − Σ_i dec(dot0_i·v_i))   (j > 1, Gram-Schmidt init)
  *   repeat `iters` times:
  *     u  = castDouble(Σ_t dec(a·v))  per id      [A v]
  *     w0 = castDouble(Σ_d dec(a·u))  per token   [Aᵀ u]
  *     w  = w0 − castDouble(Σ_i dec((σ_i²·(v_i·v))·v_i))  (implicit
  *          deflation: AᵀA − Σ σ²vvᵀ — the residual never densifies)
  *     v  = w / √castDouble(Σ dec(w·w))
  *   σ_j = ‖A v‖, u_j = A v / σ_j
  *
  * where dec(x) = CAST(x AS DECIMAL(38,18)) — i.e. the SHORTEST-DECIMAL
  * representation of the double rounded HALF_UP at 18 fractional digits,
  * which on the JVM is precisely `BigDecimal.valueOf(x).setScale(18,
  * HALF_UP)` (what Spark's double→decimal cast does), and Σ is the exact
  * decimal sum (associative, so partitioning/iteration order cannot
  * perturb an ulp). castDouble is the correctly-rounded decimal→double.
  *
  * Index-space contract: callers pass cells with ids in [0,nIds) and
  * tokens in [0,nToks) where BOTH index assignments follow the natural
  * ascending order of the underlying keys — tie-breaks ("lowest index
  * wins") then equal the SQL tie-breaks ("lowest token/id wins").
  */
object PowerCore {

  /** One singular triple: σ, right vector v (token-indexed), and the
    * UNNORMALIZED left image av = A·v (id-indexed; u = av/σ).
    */
  final case class Factor(sigma: Double, v: Array[Double], av: Array[Double])

  /** The Spark double→decimal(38,18) cast, exactly. */
  def dec(x: Double): JBig =
    JBig.valueOf(x).setScale(18, RoundingMode.HALF_UP)

  private def sumInto(acc: Array[JBig], i: Int, x: Double): Unit =
    acc(i) = acc(i).add(dec(x))

  private def zeros(n: Int): Array[JBig] = Array.fill(n)(JBig.ZERO)

  /** Exact-decimal dot product Σ dec(x·y) cast back to double. */
  def dot(x: Array[Double], y: Array[Double]): Double = {
    var acc = JBig.ZERO
    var i = 0
    while (i < x.length) { acc = acc.add(dec(x(i) * y(i))); i += 1 }
    acc.doubleValue
  }

  /** k singular triples of the sparse cells matrix by sequential
    * implicit deflation. Always returns exactly k factors: when a
    * residual collapses to zero norm (rank-deficient input, e.g. a
    * 2-sentence group factored at k=5), the normalize step yields the
    * ZERO vector and the concept continues with σ=0 — deflation against
    * a zero factor is a no-op, so later concepts are unaffected. This
    * zero-continue convention is what the SQL oracles replay (their
    * normalize guards `nrm = 0`), keeping engine and oracle total on
    * degenerate groups instead of diverging on an early stop.
    */
  def factorize(nIds: Int, nToks: Int, cellIds: Array[Int],
      cellToks: Array[Int], cellAs: Array[Double],
      k: Int, iters: Int): Array[Factor] = {
    require(k >= 1 && iters >= 1)
    val nnz = cellAs.length

    def matvecV(v: Array[Double]): Array[Double] = { // u = A v
      val acc = zeros(nIds)
      var i = 0
      while (i < nnz) { sumInto(acc, cellIds(i), cellAs(i) * v(cellToks(i))); i += 1 }
      acc.map(_.doubleValue)
    }
    def matvecU(u: Array[Double]): Array[Double] = { // w = Aᵀ u
      val acc = zeros(nToks)
      var i = 0
      while (i < nnz) { sumInto(acc, cellToks(i), cellAs(i) * u(cellIds(i))); i += 1 }
      acc.map(_.doubleValue)
    }
    def norm(w: Array[Double]): Double = {
      var acc = JBig.ZERO
      var i = 0
      while (i < w.length) { acc = acc.add(dec(w(i) * w(i))); i += 1 }
      math.sqrt(acc.doubleValue)
    }

    def normalize(w: Array[Double]): Array[Double] = {
      val n = norm(w)
      if (n == 0.0) Array.fill(w.length)(0.0) else w.map(_ / n)
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Factor]
    val c0 = 1.0 / math.sqrt(nToks.toDouble)
    var j = 0
    while (j < k) {
      // init: uniform, Gram-Schmidt-orthogonalized against prior v's
      var v: Array[Double] =
        if (out.isEmpty) Array.fill(nToks)(c0)
        else {
          val corr = zeros(nToks)
          out.foreach { f =>
            var acc = JBig.ZERO
            var t = 0
            while (t < nToks) { acc = acc.add(dec(f.v(t) * c0)); t += 1 }
            val d0 = acc.doubleValue
            t = 0
            while (t < nToks) { sumInto(corr, t, d0 * f.v(t)); t += 1 }
          }
          normalize(Array.tabulate(nToks)(t => c0 - corr(t).doubleValue))
        }
      var it = 0
      while (it < iters) {
        val u = matvecV(v)
        val w0 = matvecU(u)
        val w =
          if (out.isEmpty) w0
          else {
            val corr = zeros(nToks)
            out.foreach { f =>
              val s2 = f.sigma * f.sigma
              val d = dot(f.v, v) // Σ dec(v_i·v), pinned order v_i * v
              var t = 0
              while (t < nToks) { sumInto(corr, t, (s2 * d) * f.v(t)); t += 1 }
            }
            Array.tabulate(nToks)(t => w0(t) - corr(t).doubleValue)
          }
        v = normalize(w)
        it += 1
      }
      val av = matvecV(v)
      out += Factor(norm(av), v, av)
      j += 1
    }
    out.toArray
  }
}
