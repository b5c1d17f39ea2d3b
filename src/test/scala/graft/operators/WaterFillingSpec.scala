package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** c38_water_filling — pins the level selection on a hand-worked
  * skewed case (small sources saturate, the big one absorbs the rest)
  * and the budget-sum invariant.
  */
class WaterFillingSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String, String)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("wf_docs").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("c38_water_filling")(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("avail"), r.getAs[Double]("allocated"),
          r.getAs[Boolean]("saturated"), r.getAs[Double]("level")))
      .toMap
  }

  test("skewed sources: small ones saturate, level absorbs the remainder") {
    // avail: a=2, b=5, c=20 tokens; budget = 27 div 2 = 13
    // level candidates: j=1: 13/3=4.33>2 infeasible; j=2: 11/2=5.5>5
    // infeasible; j=3: (13-7)/1=6 <= 20 feasible -> L=6
    val docs = Seq(
      (1L, "a", "one two"),
      (2L, "b", "one two three four five"),
      (3L, "c", (1 to 20).map(i => s"w$i").mkString(" ")))
    val got = run(docs)
    assert(got("a") == ((2L, 2.0, true, 6.0)), s"a: ${got("a")}")
    assert(got("b") == ((5L, 5.0, true, 6.0)), s"b: ${got("b")}")
    assert(got("c") == ((20L, 6.0, false, 6.0)), s"c: ${got("c")}")
    assert(got.values.map(_._2).sum == 13.0)
  }

  test("uniform sources: nobody saturates, everyone gets budget/n") {
    val docs = (0 until 4).map { i =>
      (i.toLong, s"s$i", (1 to 10).map(j => s"w$j").mkString(" "))
    }
    val got = run(docs)
    // budget = 40 div 2 = 20, level = 5, no saturation
    got.values.foreach { case (avail, alloc, sat, level) =>
      assert(avail == 10L && alloc == 5.0 && !sat && level == 5.0)
    }
  }
}
