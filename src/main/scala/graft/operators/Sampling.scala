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
}
