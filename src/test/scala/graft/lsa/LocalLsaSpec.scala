package graft.lsa

import graft.SparkSpec

/** LocalLsa is the per-group mirror of the distributed Lsa.concepts —
  * both must select identical keywords and documents, with singular
  * values agreeing to numerical precision (Breeze LAPACK vs ARPACK).
  */
class LocalLsaSpec extends SparkSpec {
  import spark.implicits._

  // per-token count patterns kept distinct across docs so loadings are
  // well-separated (exact ties are exercised separately — they fall to
  // the 1e-6 quantized grid + token/index tie-break in both impls)
  private val docs = Seq(
    (0L, "spark cluster executor spark cluster scaling executor spark"),
    (1L, "cluster executor spark shuffle cluster partition"),
    (2L, "banana mango fruit banana smoothie mango banana"),
    (3L, "mango fruit banana juice mango fruit fruit tropical"),
    (4L, "spark cluster executor deployment spark executor executor"))

  test("LocalLsa matches distributed Lsa.concepts (keywords, docs, sigma)") {
    val cfg = Lsa.Config(k = 2, lemma = false)
    val dist = Lsa.concepts(docs.toDF("doc_id", "text"), "doc_id", "text", cfg)
      .as[Lsa.Concept].collect().sortBy(_.concept)
    val local = LocalLsa.concepts(docs, cfg).sortBy(_.concept)
    assert(dist.length == local.length)
    dist.zip(local).foreach { case (d, l) =>
      assert(d.concept == l.concept)
      assert(math.abs(d.singular_value - l.singularValue) < 1e-6,
        s"sigma ${d.singular_value} vs ${l.singularValue}")
      assert(d.keywords == l.keywords, s"concept ${d.concept} keywords")
      assert(d.doc_ids == l.docIds, s"concept ${d.concept} docs")
    }
  }

  test("LocalLsa matches with the lemmatizer enabled") {
    // multiplicities differ per (doc, term) so loadings are well-separated
    // (near-tied loadings may legitimately order differently between
    // ARPACK and LAPACK — that is float noise, not a mirror bug)
    val texts = Seq(
      (0L, "the dogs dogs dogs and cats cats were running"),
      (1L, "dogs dogs cats running running running in fields"),
      (2L, "the markets markets markets traders traders stocks"),
      (3L, "markets traders traders stocks stocks stocks indexes"),
      (4L, "dogs cats cats cats fields fields running daily"))
    val cfg = Lsa.Config(k = 2)
    val dist = Lsa.concepts(texts.toDF("doc_id", "text"), "doc_id", "text", cfg)
      .as[Lsa.Concept].collect().sortBy(_.concept)
    val local = LocalLsa.concepts(texts, cfg).sortBy(_.concept)
    assert(dist.map(c => (c.concept, c.keywords, c.doc_ids)).toSeq ==
      local.map(c => (c.concept, c.keywords, c.docIds)).toSeq)
  }
}
