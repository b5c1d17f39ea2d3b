package graft.operators

import graft.SparkSpec

/** The central determinism claim of the trainable operators: the
  * DECIMAL-sum discipline makes learned parameters a pure function of
  * the data — bit-identical under ANY partitioning. The DuckDB oracle
  * proves engine-vs-SQL equality at one partitioning; these specs prove
  * partitioning itself can't move a weight.
  */
class TrainDeterminismSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 40L).map { id =>
    (id, ("alpha beta " * (id % 9).toInt) + ("42 " * (id % 5).toInt) + id)
  }.toDF("doc_id", "text")

  test("QualityModel.train is bit-identical across partitionings") {
    val models = Seq(1, 3, 7).map { p =>
      QualityModel.train(QualityModel.rawFeatures(docs.repartition(p)))
    }
    models.sliding(2).foreach { case Seq(a, b) =>
      assert(a.mu.toSeq == b.mu.toSeq, "means moved with partitioning")
      assert(a.w.toSeq == b.w.toSeq, "weights moved with partitioning")
    }
    // and the model is not degenerate (training saw both classes)
    assert(models.head.w.exists(_ != 0.0))
  }

  test("Nmf.factorize is bit-identical across partitionings") {
    def run(p: Int): (Seq[(Long, Int, java.math.BigDecimal)],
        Seq[(Int, String, java.math.BigDecimal)]) = {
      val v = Nmf.tfidf(docs.repartition(p), maxDfFrac = 0.9).repartition(p)
      val (w, h) = Nmf.factorize(v, k = 3, rounds = 2)
      (w.collect().map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
        .toSeq.sortBy(t => (t._1, t._2)),
        h.collect().map(r => (r.getInt(0), r.getString(1), r.getDecimal(2)))
          .toSeq.sortBy(t => (t._1, t._2)))
    }
    val (w1, h1) = run(1)
    val (w7, h7) = run(7)
    assert(w1 == w7, "W moved with partitioning")
    assert(h1 == h7, "H moved with partitioning")
    assert(w1.nonEmpty && h1.nonEmpty)
  }
}
