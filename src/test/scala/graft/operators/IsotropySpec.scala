package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** e11_isotropy — pins (a) the closed-form mean pairwise cosine equals
  * the literal O(n²) pair average, and (b) the audit's diagnostic
  * behavior: a planted common direction drives avg_cos up and
  * mean-centering removes it.
  */
class IsotropySpec extends SparkSpec {

  private def run(vecs: Seq[Array[Float]]): (Long, Double, Double, Double) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("iso_vecs").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.SparkEntry.queries("e11_isotropy")(spark, dir).head()
    (r.getAs[Long]("n"), r.getAs[Double]("mean_norm"),
      r.getAs[Double]("avg_cos"), r.getAs[Double]("avg_cos_centered"))
  }

  private def bruteAvgCos(vecs: Seq[Array[Float]]): Double = {
    val u = vecs.map { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(_ / n)
    }
    val n = u.length
    val s = (for {
      i <- u.indices; j <- u.indices if i != j
    } yield u(i).zip(u(j)).map { case (a, b) => a.toDouble * b }.sum).sum
    s / (n.toDouble * (n - 1))
  }

  private def rng(seed: Long): Iterator[Double] = {
    var x = seed
    Iterator.continually {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
  }

  test("closed-form avg_cos equals the literal pair average") {
    val r = rng(7L)
    val vecs = Seq.fill(40)(Array.fill(16)(r.next().toFloat))
    val (n, _, avgCos, _) = run(vecs)
    assert(n == 40)
    assert(math.abs(avgCos - bruteAvgCos(vecs)) < 2e-6,
      s"$avgCos vs ${bruteAvgCos(vecs)}")
  }

  test("a planted common direction is detected and centering removes it") {
    val r = rng(13L)
    // random noise + a strong shared component on dim 0
    val vecs = Seq.fill(60)(Array.tabulate(16)(d =>
      (r.next() * 0.2 + (if (d == 0) 1.0 else 0.0)).toFloat))
    val (_, meanNorm, avgCos, avgCosCentered) = run(vecs)
    assert(meanNorm > 0.8, s"mean_norm $meanNorm should be near 1")
    assert(avgCos > 0.8, s"avg_cos $avgCos should be inflated by the hub direction")
    assert(math.abs(avgCosCentered) < 0.1,
      s"centered avg_cos $avgCosCentered should collapse toward 0")
  }
}
