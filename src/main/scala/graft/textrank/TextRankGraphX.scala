package graft.textrank

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** GraphX backend for the TextRank iteration (SURVEY.md G5/G6: "GraphX
  * aggregateMessages / Pregel maps 1:1") — same semantics as the
  * DataFrame loop in [[TextRank.ranks]]:
  * message = srcRank × normalizedWeight, merge = sum,
  * update = 0.15 + 0.85 × Σ.
  *
  * Q4 caveat: the reference drops vertices that receive no contributions
  * from the rank table; on the (always-symmetric) similarity graphs both
  * backends agree because every vertex with an edge receives messages
  * every round. On a hand-built asymmetric graph this backend keeps a
  * quiet vertex's previous rank instead of dropping it — asserted
  * equivalent for the engine's own graphs in TextRankGraphXSpec.
  *
  * Scale note: vertex ids must be Long (GraphX contract). The DataFrame
  * backend stays the default — it benefits from AQE and Tungsten — but
  * this backend demonstrates the Pregel formulation and is preferable
  * when many more iterations (to convergence) are wanted, since GraphX
  * keeps the edge partitioning resident across supersteps.
  */
object TextRankGraphX {

  def ranks(edges: DataFrame, cfg: TextRank.Config = TextRank.Config()): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Serialized + spillable storage throughout: the edge set is the
    // materialized similarity join — quadratic in band-filtered docs —
    // and GraphX's default MEMORY_ONLY holds it as deserialized Edge
    // objects (~5-10x the serialized size). At the sf1 stress scale
    // that OOM'd an 8g heap outright (round-9 full-registry sweep);
    // MEMORY_AND_DISK_SER bounds heap use and degrades to disk instead
    // of dying, which is the behavior a 100 TB run needs. Values are
    // unaffected (storage level only).
    val lvl = StorageLevel.MEMORY_AND_DISK_SER
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double")).as[(Long, Long, Double)].rdd
      .persist(lvl) // lineage holds the quadratic similarity join — 3 consumers
    val outSum = e.map(t => (t._1, t._3)).reduceByKey(_ + _)
    val normalized = e.map(t => (t._1, (t._2, t._3))).join(outSum)
      .map { case (src, ((dst, w), ow)) => Edge(src, dst, w / ow) }
    val vertices = e.flatMap(t => Seq(t._1, t._2)).distinct()
      .map(id => (id, cfg.initRank))
    var g = Graph(vertices, normalized,
      defaultVertexAttr = cfg.initRank,
      edgeStorageLevel = lvl, vertexStorageLevel = lvl).cache()
    g.edges.count() // materialize once, then release the input lineage
    e.unpersist(blocking = false)
    for (_ <- 1 to cfg.iterations) {
      val msgs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr * ctx.attr), _ + _)
      val next = g.outerJoinVertices(msgs) { (_, old, msg) =>
        msg.map(m => cfg.initRank + cfg.damping * m).getOrElse(old)
      }.cache()
      next.vertices.count() // materialize before unpersisting the parent
      g.unpersist(blocking = false)
      g = next
    }
    g.vertices.toDF("id", "rnk")
  }
}
