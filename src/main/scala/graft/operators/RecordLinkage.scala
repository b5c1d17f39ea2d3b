package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — Fellegi & Sunter 1969 ("A Theory for
  * Record Linkage", JASA 64) scoring over a blocked candidate-pair
  * table. Entity resolution is the curation step that reconciles the
  * same real-world entity across sources before dedup/canonicalization
  * can treat them as one.
  *
  * The operator takes the PAIR table (already blocked — blocking is the
  * scale lever and lives at the query site) with one boolean agreement
  * column per compared field, plus per-field prior match probabilities
  * m_f. The non-match agreement rates u_f are ESTIMATED FROM THE DATA
  * as the field agreement frequency among known-non-matching blocked
  * pairs (the classical u ~ random-agreement estimate; EM refinement is
  * a documented non-goal). Each field contributes the log-likelihood
  * ratio weight ln(m/u) on agreement and ln((1-m)/(1-u)) on
  * disagreement; the pair score is their sum.
  *
  * Scale shape: u estimation is ONE aggregate over the pair table (3
  * doubles to the driver via a broadcast crossJoin — no collect of
  * data rows); scoring is a narrow map over pairs. The pair table
  * itself is bounded by the blocking discipline upstream: block keys
  * must keep per-block cardinality square-root-ish (nation-level blocks
  * here at gate scale; production blocks add a name-prefix/sorted-
  * neighborhood component, cf. d14).
  *
  * Determinism: u_f are exact (0/1 sums in doubles, then one division);
  * weights are 6dp-rounded before summation; the sum is left-to-right
  * in `agreeCols` order — identical IEEE arithmetic in the oracle.
  */
object RecordLinkage {

  /** Score blocked pairs. `pairs` must carry the `agreeCols` boolean
    * columns and whatever keys the caller needs; `nonMatch` selects the
    * pairs used to estimate u_f (typically key_a != key_b).
    * Adds a 6dp `score` column; u clamps to [1e-6, 0.999999] so fully
    * (dis)agreeing fields cannot produce infinite weights.
    */
  def fellegiSunter(pairs: DataFrame, agreeCols: Seq[String],
      m: Map[String, Double], nonMatch: Column): DataFrame = {
    require(agreeCols.nonEmpty && agreeCols.forall(m.contains),
      "every agreement column needs an m prior")
    // the pair table feeds BOTH the u aggregate and the scoring pass;
    // it is NOT persisted on purpose — the blocked broadcast join that
    // produces it is cheaper to replay than a pairs-sized cache
    // (measured at sf0.1: persist 24.9 s vs replay 17.3 s), and at
    // corpus scale a pairs-sized cache is exactly what must not exist
    // degenerate blocking (zero non-match pairs) makes avg() null, and
    // null would flow through the clamp into every score: fall back to
    // the uninformative u=0.5 (agreement carries no evidence) instead
    val uExprs = agreeCols.map(c =>
      coalesce(avg(col(c).cast("double")), lit(0.5)).as(s"u_$c"))
    val u = pairs.filter(nonMatch).agg(uExprs.head, uExprs.tail: _*)
    val score = agreeCols.map { c =>
      val uc = least(greatest(col(s"u_$c"), lit(1e-6)), lit(0.999999))
      val wAgree = round(log(lit(m(c)) / uc), 6)
      val wDis = round(log((lit(1.0) - lit(m(c))) / (lit(1.0) - uc)), 6)
      when(col(c), wAgree).otherwise(wDis)
    }.reduce(_ + _)
    pairs.crossJoin(broadcast(u))
      .withColumn("score", round(score, 6))
      .drop(agreeCols.map(c => s"u_$c"): _*)
  }

  /** The per-field (agreeWeight, disagreeWeight) pairs as DRIVER
    * literals — the offline-estimate/online-score split (sm18): u is
    * estimated in batch exactly as [[fellegiSunter]] does (same
    * expressions, so the collected doubles are bit-identical to the
    * in-plan path), then a record STREAM scores against the weights as
    * broadcast literals. The collect is 2·|fields| doubles.
    */
  def weightLiterals(pairs: DataFrame, agreeCols: Seq[String],
      m: Map[String, Double], nonMatch: Column): Map[String, (Double, Double)] = {
    // same u=0.5 fallback as fellegiSunter: the two paths must stay
    // bit-identical, degenerate blocking included
    val uExprs = agreeCols.map(c =>
      coalesce(avg(col(c).cast("double")), lit(0.5)).as(s"u_$c"))
    val u = pairs.filter(nonMatch).agg(uExprs.head, uExprs.tail: _*)
    val wExprs = agreeCols.flatMap { c =>
      val uc = least(greatest(col(s"u_$c"), lit(1e-6)), lit(0.999999))
      Seq(round(log(lit(m(c)) / uc), 6).as(s"wa_$c"),
        round(log((lit(1.0) - lit(m(c))) / (lit(1.0) - uc)), 6).as(s"wd_$c"))
    }
    // collect-bound: model: one row of per-column Fellegi-Sunter weights
    val row = u.select(wExprs: _*).collect().head
    agreeCols.map(c => c -> ((row.getAs[Double](s"wa_$c"),
      row.getAs[Double](s"wd_$c")))).toMap
  }

  /** Score a (possibly streaming) pair table with pre-estimated weight
    * literals; same 6dp-rounded left-to-right sum as [[fellegiSunter]].
    */
  def scoreWithWeights(pairs: DataFrame, agreeCols: Seq[String],
      w: Map[String, (Double, Double)]): DataFrame = {
    val score = agreeCols.map { c =>
      when(col(c), lit(w(c)._1)).otherwise(lit(w(c)._2))
    }.reduce(_ + _)
    pairs.withColumn("score", round(score, 6))
  }
}
