package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Conservation properties of the cut/segment operators on
  * pseudo-random corpora (fixed seed — deterministic like every spec).
  */
class CutReconstructPropSpec extends SparkSpec {
  import spark.implicits._

  test("span removal conserves characters: n_cut + |clean| = |text|") {
    val rnd = new Random(7)
    val blocks = Array.fill(6)(Random.alphanumeric.take(30).mkString)
    // docs stitched from a small block pool -> plenty of cross-doc
    // 20-gram duplication, plus unique glue
    val docs = (0L until 40L).map { i =>
      val parts = Seq.fill(4)(blocks(rnd.nextInt(blocks.length)))
      (i, parts.mkString(s"<${rnd.nextInt(1000)}>"))
    }.toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", k = 20)
      .select($"id", $"n_spans", $"n_cut", $"clean_text")
      .collect()
    assert(out.length == 40)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (id, nSpans, nCut, clean) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nCut + clean.length == texts(id).length,
        s"doc $id conservation")
      assert((nSpans == 0) == (clean == texts(id)), s"doc $id identity")
    }
    // the block pool guarantees at least some cutting happened
    assert(out.map(_.getLong(2)).sum > 0)
  }

  test("unigram segmentation always reconstructs the word") {
    val rnd = new Random(11)
    val words = (0 until 120).map { _ =>
      (1 to (2 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(5)).toChar)
        .mkString
    }.distinct
    val wf = words.map(w => (w, 1L + rnd.nextInt(50).toLong))
      .toDF("word", "freq")
    val out = Unigram.train(spark, wf, vocabSize = 48, maxLen = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    words.foreach { w =>
      val seg = Unigram.segment(w, out, 6)
      assert(seg.mkString == w, s"word $w reconstructs")
      assert(seg.forall(out.contains), s"word $w uses surviving pieces")
    }
  }
}
