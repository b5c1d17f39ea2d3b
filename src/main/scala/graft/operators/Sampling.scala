package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** Deterministic sampling operators (SURVEY §7.5). c07 gives each
  * stratum a UNIFORM hash-ordered sample; this adds the weighted
  * counterpart.
  */
object Sampling {

  /** Efraimidis–Spirakis weighted sampling without replacement (the
    * "exponential race"): each row draws `u ∈ (0,1]` and competes with
    * key `-ln(u)/w` — the k smallest keys are a weighted sample, rows
    * with twice the weight being twice as likely to make the cut.
    *
    * Everything is deterministic: `u` comes from the low 20 bits of
    * FNV-1a(id) — reproducible across runs, engines, and reshards, and
    * uncorrelated with ingest order. Keys are 9dp-rounded with id
    * tiebreaks so the selection is stable under float comparison.
    *
    * Scale shape: one shuffle keyed on the stratum; the `row_number <=
    * k` filter pushes down as WindowGroupLimit, so each map task
    * forwards at most k rows per stratum — the window never sees the
    * corpus, only per-stratum candidates.
    *
    * Output: input columns + (skey, rn) for rows with rn <= k.
    */
  def weightedStratifiedSample(df: DataFrame, idCol: String,
      stratumCol: String, weight: Column, k: Int): DataFrame = {
    val low20 = Fnv.fnv1a64(col(idCol).cast("string"))
      .bitwiseAND(lit(1048575L))
    val u = (low20 + lit(1L)).cast("double") / lit(1048576.0)
    val key = round(-log(u) / weight.cast("double"), 9)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("skey"), col(idCol))
    df.withColumn("skey", key)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** CCNet sampled-cutoff terciles — the 100 TB route past a27's exact
    * per-group rank windows (whose parallelism is bounded by the group
    * count): estimate each group's head/middle tercile CUTOFF VALUES
    * from a deterministic bottom-k-by-hash sample (the sk10 recipe —
    * k smallest FNV permutation hashes per group, computed map-side by
    * Spark's WindowGroupLimit partial top-k, never sorting a group),
    * then bucket the full table by broadcast-joined thresholds: one
    * narrow per-row CASE, no global sort, no rank over the corpus.
    *
    * Cutoffs are order statistics of the ≤k-row sample: cut_head at
    * 1-based rank ⌈m/3⌉, cut_middle at ⌈2m/3⌉ (m = sample size), ties
    * at a cutoff all falling to the LOWER bucket — a deterministic
    * value rule both engines can replay, unlike the exact route's
    * rank rule (which needs the global ordinal). Agreement with exact
    * terciles is within standard bottom-k sampling error
    * (CcnetSampledSpec pins ≥90% doc agreement at k=64 on the gate
    * corpus).
    *
    * @return `scored` + (cut_head, cut_middle, bucket)
    */
  def sampledTerciles(scored: DataFrame, idCol: String, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val wH = Window.partitionBy(col(groupCol)).orderBy(col("hv_"), col(idCol))
    val samp = scored.select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("hv_", Fnv.fnv1a_perm(lit(1), col(idCol)))
      .withColumn("rk_", row_number().over(wH))
      .filter(col("rk_") <= k)
    val wS = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val cuts = samp
      .withColumn("r_", row_number().over(wS))
      .withColumn("m_", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .groupBy(col(groupCol))
      .agg(
        max(when(col("r_") === expr("(m_ + 2) div 3"), col(valueCol)))
          .as("cut_head"),
        max(when(col("r_") === expr("(2 * m_ + 2) div 3"), col(valueCol)))
          .as("cut_middle"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .withColumn("bucket",
        when(col(valueCol) <= col("cut_head"), "head")
          .when(col(valueCol) <= col("cut_middle"), "middle")
          .otherwise("tail"))
  }
}
