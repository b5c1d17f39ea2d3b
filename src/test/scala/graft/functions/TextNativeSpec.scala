package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.StopWords

/** Pins the one-pass text-analysis expressions (TextNative) and the HLL
  * bit helpers (BitExprs) the same way FusedExprInterpretedSpec pins the
  * fused kernels: (1) equality with the composed-builtin reference each
  * expression replaced, over real corpus text plus adversarial edges;
  * (2) bit-identical agreement between the codegen and interpreted
  * evaluators (constant folding and codegen fallbacks hit `eval()` even
  * in codegen mode). These expressions sit under the oracle-gated
  * a01/a02/c01/sk* queries, so a divergence here is a silent gate FAIL
  * at best and a wrong 100 TB answer at worst.
  */
class TextNativeSpec extends SparkSpec {
  import spark.implicits._

  private def withNoCodegen[T](f: => T): T = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  // Corpus rows + adversarial edges: empty, whitespace-only, digits-only,
  // punct-only, unicode (accents, Han, astral), null.
  private lazy val texts = {
    val corpus = graft.tables.Tables.documents(spark, sf("sf0.001"))
      .limit(50).select($"text").as[String].collect().toSeq
    corpus ++ Seq("", "   ", "12345", "!?;:,.", "café déjà vu",
      "中文 text", "😀 emoji!", "a1b2c3 ... x_y-z",
      null)
  }

  private lazy val df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    .withColumn("toks", split(lower(coalesce($"text", lit(""))), "[^a-z]+"))

  test("punct_count == length(regexp_replace(text, \"[A-Za-z0-9\\\\s]\", \"\"))") {
    val rows = df.select($"id",
        TextNative.punct_count($"text").as("fast"),
        length(regexp_replace($"text", "[A-Za-z0-9\\s]", "")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity: $r")
      if (!r.isNullAt(1)) assert(r.getInt(1) == r.getInt(2), s"punct: $r")
    }
  }

  test("digit_count == length(regexp_replace(text, \"[^0-9]\", \"\"))") {
    val rows = df.select($"id",
        TextNative.digit_count($"text").as("fast"),
        length(regexp_replace($"text", "[^0-9]", "")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null parity: $r")
      if (!r.isNullAt(1)) assert(r.getInt(1) == r.getInt(2), s"digit: $r")
    }
  }

  test("nltk_stop_count / remove_stopwords == the filter+array_contains forms") {
    val stop = typedLit(StopWords.nltkEnglishAlpha)
    val rows = df.select(
        TextNative.nltk_stop_count($"toks").as("fastN"),
        size(filter($"toks", t => array_contains(stop, t))).as("refN"),
        TextNative.remove_stopwords($"toks").as("fastR"),
        filter($"toks", t => !array_contains(stop, t)).as("refR"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"stop count: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"remove_stopwords must keep duplicates and order: $r")
    }
  }

  test("token_counts: insertion-ordered occurrence map matches a fold") {
    // map_entries preserves the map data's physical order; Row.getMap
    // would round-trip through an unordered scala Map and lose it
    val rows = df.select($"toks",
        map_entries(TextNative.token_counts($"toks")).as("e")).collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => e.getString(0) -> e.getInt(1))
      // values: exact occurrence counts
      val ref = toks.groupBy(identity).view.mapValues(_.size).toMap
      assert(entries.toMap == ref, s"counts: $toks -> $entries")
      // keys: first-occurrence order
      assert(entries.map(_._1) == toks.distinct,
        s"insertion order: $toks -> $entries")
    }
  }

  test("lang_id fixed points: Han wins immediately, zero votes -> und") {
    val rows = Seq("中文 the and of", // Han beats any vote
        "", "12345 !!!", "zzz qqq xxx")
      .toDF("t").select(TextNative.lang_id($"t")).as[String].collect()
    assert(rows(0) == "zh")
    assert(rows(1) == "und" && rows(2) == "und" && rows(3) == "und")
  }

  test("nlz_plus1 / ntz_plus1 == the JDK intrinsics, all edge patterns") {
    val rnd = new scala.util.Random(7)
    val ws = Seq(0L, 1L, -1L, 2L, 3L, Long.MinValue, Long.MaxValue) ++
      (0 until 64).map(1L << _) ++ Seq.fill(50)(rnd.nextLong())
    val rows = ws.toDF("w").select($"w",
        BitExprs.nlz_plus1($"w").as("nlz"),
        BitExprs.ntz_plus1($"w").as("ntz")).collect()
    rows.foreach { r =>
      val w = r.getLong(0)
      assert(r.getInt(1) == java.lang.Long.numberOfLeadingZeros(w) + 1,
        s"nlz($w)")
      assert(r.getInt(2) == java.lang.Long.numberOfTrailingZeros(w) + 1,
        s"ntz($w)")
    }
    // the HLL rho convention: zero input -> 65 on both sides
    val z = rows.find(_.getLong(0) == 0L).get
    assert(z.getInt(1) == 65 && z.getInt(2) == 65)
  }

  test("codegen and interpreted paths agree for the whole family") {
    def all() = df.select($"id",
        TextNative.punct_count($"text"),
        TextNative.digit_count($"text"),
        TextNative.lang_id($"text"),
        TextNative.nltk_stop_count($"toks"),
        TextNative.remove_stopwords($"toks"),
        map_entries(TextNative.token_counts($"toks")),
        BitExprs.nlz_plus1($"id"),
        BitExprs.ntz_plus1($"id"),
        UnicodeNative.nfc_normalize($"text"),
        UnicodeNative.strip_accents($"text"))
      .orderBy($"id").collect().toSeq
    val gen = all()
    val interp = withNoCodegen(all())
    assert(gen == interp,
      "TextNative/BitExprs/UnicodeExprs diverge between codegen and eval")
  }
}
