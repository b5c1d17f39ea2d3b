package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration HITS (Kleinberg, "Authoritative
  * Sources in a Hyperlinked Environment", JACM 1999): hub and authority
  * scores by mutual reinforcement — a ← Σ_in h, h ← Σ_out a, each
  * 2-norm-normalized per round.
  *
  * Same float discipline as `PowerLsa`/`Pca`: scatter sums accumulate
  * as DECIMAL (associative — partition order unobservable), norms are
  * √(exact sum of squares), and the only doubles are per-row products
  * and the final normalize — so a SQL oracle replays the whole
  * trajectory bit-for-bit from a fixed uniform start (no sign/seed
  * ambiguity: scores are nonnegative by construction).
  *
  * 100 TB shape: per round, two shuffled join+agg scatters over the
  * edge list (exactly PageRank's plan — TextRank.ranks shares it), a
  * vertex-table left join to keep sink/source-only vertices at 0, and
  * a broadcast norm row; lineage cut per round with localCheckpoint.
  */
object Hits {

  private val Dec = "decimal(38,18)"

  /** edges: (src, dst), directed, duplicates allowed (each occurrence
    * contributes). Output: (id, hub, authority) over ALL vertices,
    * 6dp-rounded.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val nv = verts.count()

    // one scatter: sum x(keyCol) into groups of outCol, fill missing
    // vertices with 0, normalize by the exact-decimal 2-norm
    def step(keyCol: String, outCol: String, x: DataFrame): DataFrame = {
      val raw = edges.join(x.select(col("id").as(keyCol), col("v")),
          Seq(keyCol))
        .groupBy(col(outCol))
        .agg(sum(col("v").cast(Dec)).cast("double").as("s"))
      val filled = verts
        .join(raw.withColumnRenamed(outCol, "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
      val nrm = filled.agg(
        sqrt(sum((col("s") * col("s")).cast(Dec)).cast("double")).as("nrm"))
      filled.crossJoin(broadcast(nrm))
        .select(col("id"), (col("s") / col("nrm")).as("v"))
        .localCheckpoint(true)
    }

    var h = verts.withColumn("v", lit(1.0) / sqrt(lit(nv.toDouble)))
      .localCheckpoint(true)
    var a: DataFrame = h
    (1 to iters).foreach { _ =>
      a = step("src", "dst", h) // authority: in-edge hub mass
      h = step("dst", "src", a) // hub: out-edge authority mass
    }
    h.select(col("id"), col("v").as("hub"))
      .join(a.select(col("id"), col("v").as("authority")), Seq("id"))
      .select(col("id"), round(col("hub"), 6).as("hub"),
        round(col("authority"), 6).as("authority"))
  }
}
