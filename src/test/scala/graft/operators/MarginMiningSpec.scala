package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** s22_margin_mining — pins the property the margin criterion exists
  * for (Artetxe & Schwenk 2019): a HUB vector that is moderately close
  * to every query wins every raw-cosine argmax, but its own high k-NN
  * average prices it out of the margin score, so each query's margin
  * match is its genuine partner instead.
  */
class MarginMiningSpec extends SparkSpec {

  test("margin mining rejects the hub that raw cosine selects") {
    import spark.implicits._
    val dim = 64
    def unit(axis: Int, scale: Float = 1f): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = scale; a
    }
    // queries = even ids 0,2,4,6 on axes e0..e3
    val queries = (0 until 4).map(i => (i * 2L, unit(i), i))
    // hub (id 1) equidistant from every query at cos 0.5;
    // true partners (ids 3,5,7,9) at cos ~0.48 to one query each,
    // plus a faint 0.001 component toward every OTHER query so each
    // partner has 4 defined neighbors for the k=4 penalty
    val hub = {
      val a = Array.fill(dim)(0f)
      (0 until 4).foreach(i => a(i) = 0.5f); a
    }
    val partners = (0 until 4).map { i =>
      val a = Array.fill(dim)(0.001f)
      a(i) = 0.48f
      (i * 2L + 3L, a, 10 + i)
    }
    val rows = queries ++ Seq((1L, hub, 9)) ++ partners
    val dir = Files.createTempDirectory("margin_vecs").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = graft.SparkEntry.queries("s22_margin_mining")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("match_id"), r.getAs[Double]("cosine")))
      .toMap
    assert(out.keySet == Set(0L, 2L, 4L, 6L))
    // construction sanity: raw cosine argmax IS the hub for every query
    // (cos 0.5 to hub > ~0.48 to the partner) — so any non-hub match
    // below is the margin's doing
    out.foreach { case (q, (m, _)) =>
      assert(m == q + 3L, s"query $q matched $m, expected partner ${q + 3L}")
    }
  }

  test("margin match degrades to raw-cosine match when no hub exists") {
    import spark.implicits._
    val dim = 64
    val rows = (0 until 8).map { i =>
      val a = Array.fill(dim)(0f)
      a(i / 2) = 1f
      a((i / 2 + 7) % dim) = if (i % 2 == 1) 0.3f else 0.0f
      (i.toLong, a, i)
    }
    val dir = Files.createTempDirectory("margin_vecs2").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("s22_margin_mining")(spark, dir)
      .collect()
    // even id 2k pairs with odd id 2k+1 (same principal axis)
    out.foreach { r =>
      assert(r.getAs[Long]("match_id") == r.getAs[Long]("query_id") + 1L)
    }
  }
}
