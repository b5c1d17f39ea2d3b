package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack/Clarke/Büttcher): combine ranked
  * lists from heterogeneous retrievers — lexical BM25, dense ANN,
  * anything that emits (id, rank) — by summing `1 / (k + rank)` per
  * ranker. Rank-based fusion needs no score calibration between
  * systems, which is why it is the default hybrid-retrieval combiner.
  *
  * Scale shape: each input is an already-truncated top-k list (rankers
  * at scale emit bounded lists, never full-corpus rankings), so the
  * union + one hash-agg here is over |rankers|·k rows regardless of
  * corpus size. Per-ranker contributions pivot into fixed COLUMNS and
  * add in ranker-declaration order — the float sum is IEEE-stable
  * however the union is partitioned (a plain float `sum()` over an
  * unordered group would not be), and a document missing from a
  * ranker's list contributes exactly +0.0.
  */
object Rrf {

  /** Fuse `(rankerName, ranking)` pairs; each ranking has columns
    * (doc_id, rnk) with rnk 1-based. Output: (doc_id, rrf_<name>...
    * rounded 6dp, rrf_score = fixed-order sum of the rounded terms).
    */
  def fuse(rankings: Seq[(String, DataFrame)], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "RRF needs at least one ranking")
    val tagged = rankings.map { case (nm, df) =>
      df.select(col("doc_id"), lit(nm).as("ranker"),
        col("rnk").cast("long").as("rnk"))
    }.reduce(_ unionByName _)
    val contribCols = rankings.map { case (nm, _) =>
      round(coalesce(max(when(col("ranker") === nm,
        lit(1.0) / (lit(k.toDouble) + col("rnk")))), lit(0.0)), 6)
        .as(s"rrf_$nm")
    }
    tagged.groupBy(col("doc_id"))
      .agg(contribCols.head, contribCols.tail: _*)
      .withColumn("rrf_score",
        round(rankings.map { case (nm, _) => col(s"rrf_$nm") }.reduce(_ + _), 6))
  }
}
