package graft.baseline

import breeze.linalg.{svd => bsvd, DenseMatrix}

import graft.SparkSpec

/** Ties the DuckDB-replayable power configuration of the Ozsoy baseline
  * (OzsoyPowerSummarizer, gate depth J=5) to the LAPACK/topics=15
  * parity anchor (OzsoyLsaSummarizer) on the REAL ls02 gate slice:
  *  - the σ spectrum justifies the J=5 truncation (every concept that
  *    survives the 0.75 threshold sits inside the first 5);
  *  - with enough iterations the power scores converge to the LAPACK
  *    cross-method scores, and the ls03 summary selections agree.
  */
class OzsoyPowerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sents: Seq[String] =
    spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .filter($"lang" === "en" && $"doc_id" < 200)
      .orderBy($"doc_id").select($"text").as[String].collect().toSeq

  test("surviving-concept set fits inside the J=5 gate truncation") {
    // LAPACK spectrum of the binary matrix: count σ_j >= 0.75 σ_max
    val toks = sents.map(OzsoyLsaSummarizer.tokenize)
    val vocab = toks.flatten.distinct.sorted.zipWithIndex.toMap
    val m = DenseMatrix.zeros[Double](vocab.size, sents.size)
    toks.zipWithIndex.foreach { case (ts, j) =>
      ts.foreach(t => m(vocab(t), j) = 1.0)
    }
    val sigma = bsvd.reduced(m).S.toArray
    val surviving = sigma.count(_ >= 0.75 * sigma.max)
    assert(surviving <= 5, s"$surviving concepts survive the threshold")
    assert(surviving >= 1)
  }

  test("power scores converge to the LAPACK cross-method scores") {
    val lapack = OzsoyLsaSummarizer.scoreSentences(sents, topics = 5)
    val power = OzsoyPowerSummarizer.scoreSentences(sents, topics = 5,
      iters = 48)
    assert(lapack.length == power.length)
    val scale = math.max(lapack.map(_.score).max, 1e-9)
    lapack.zip(power).foreach { case (l, p) =>
      assert(math.abs(l.score - p.score) <= 2e-3 * scale,
        s"sentence ${l.index}: lapack ${l.score} vs power ${p.score}")
    }
  }

  test("summary selections agree between the solvers") {
    val lapack = OzsoyLsaSummarizer.summarize(sents, topics = 5,
      length = 10).toSet
    val power = OzsoyPowerSummarizer.summarize(sents, length = 10,
      topics = 5, iters = 48).map(_._2).toSet
    val overlap = (lapack & power).size
    assert(overlap >= 9, s"only $overlap/10 summary sentences agree")
  }
}
