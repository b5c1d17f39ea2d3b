package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for the ls08 scale gate: runs the
  * production ARPACK solver (Lsa.concepts) and the PowerLsa twin on the
  * same lemma'd TF-IDF cells at a given sf dir and prints both concept
  * tables side by side — used to pin the twin-gate tolerance
  * empirically before wiring it into the query (see LsaQueries ls08).
  *
  * Usage: runMain graft.tools.Ls08TwinCheck [sfDir] [iters]
  */
object Ls08TwinCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("ls08-twin-check")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.tables.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val arp = graft.lsa.Lsa.concepts(docs, "doc_id", "text")
      // collect-bound: model: k=5 concept rows (offline solver-twin tool)
      .orderBy($"concept").collect()
    val tArp = (System.nanoTime() - t0) / 1e9

    val n = docs.count()
    val tok = graft.Par.fanOut(docs)
      .select($"doc_id", graft.text.TextFunctions.lsaTokens($"text", true).as("tokens"))
    val tf = graft.tfidf.TfIdf.termFrequencies(tok, "doc_id", "tokens")
    val idf = graft.tfidf.TfIdf.idfTable(tf, "doc_id", n)
    val cells = tf.join(broadcast(idf.select($"token", $"idf")), "token")
      .select($"doc_id".as("id"), $"token", round($"tf" * $"idf", 6).as("a"))
    val t1 = System.nanoTime()
    val pow = graft.lsa.PowerLsa.kConcepts(cells, 5, iters, 3, 3)
      // collect-bound: model: k=5 concept rows (offline solver-twin tool)
      .orderBy($"concept").collect()
    val tPow = (System.nanoTime() - t1) / 1e9

    println(f"[twin] dir=$dir iters=$iters arpack=$tArp%.2fs power=$tPow%.2fs")
    arp.zipAll(pow, null, null).foreach { case (a, p) =>
      val (ac, asg, akw, adc) =
        if (a == null) (-1, Double.NaN, "", "")
        else (a.getAs[Int]("concept"), a.getAs[Double]("singular_value"),
          a.getAs[Seq[String]]("keywords").mkString(" "),
          a.getAs[Seq[Long]]("doc_ids").mkString(" "))
      val (psg, pkw, pdc) =
        if (p == null) (Double.NaN, "", "")
        else (p.getAs[Double]("singular_value"), p.getAs[String]("keywords"),
          p.getAs[String]("doc_ids"))
      val rel = math.abs(asg - psg) / math.max(1.0, math.abs(asg))
      println(f"[twin] c$ac%d sigma arp=$asg%.4f pow=$psg%.4f rel=$rel%.2e " +
        f"kwEq=${akw == pkw} docEq=${adc == pdc}")
      if (akw != pkw) println(s"[twin]   kw arp='$akw' pow='$pkw'")
      if (adc != pdc) println(s"[twin]   dc arp='$adc' pow='$pdc'")
    }
    spark.stop()
  }
}
