package graft.functions

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins nfc_normalize / strip_accents to the DuckDB (utf8proc) behavior
  * the a11 gate query hash-verifies: NFD-decompose, drop non-spacing
  * marks, NFC-recompose — canonical only, never compatibility folding.
  * All non-ASCII literals are \u escapes: composed vs decomposed is
  * invisible in rendered source, and that distinction IS the test.
  */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    UnicodeNative.nfc(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    UnicodeNative.stripAccents(UTF8String.fromString(s)).toString

  test("nfc composes decomposed sequences and leaves composed text alone") {
    assert(nfc("e\u0301") == "\u00e9") // e + U+0301 -> composed e-acute
    assert(nfc("\u00e9") == "\u00e9") // already NFC
    assert(nfc("o\u0303") == "\u00f5") // o + U+0303 -> composed o-tilde
    assert(nfc("abc") == "abc") // ASCII fast path
    // Hangul jamo L+V+T compose to one syllable
    assert(nfc("\u1112\u1161\u11ab") == "\ud55c")
    // compatibility chars are NOT folded (NFC, not NFKC)
    assert(nfc("\ufb01") == "\ufb01") // fi ligature survives
    assert(nfc("\u00bd") == "\u00bd") // vulgar 1/2 survives
  }

  test("strip_accents drops Mn marks, keeps non-decomposable letters") {
    assert(strip("\u00e9\u00e0\u00fc") == "eau") // composed accented vowels
    assert(strip("\u00c7") == "C") // C-cedilla
    assert(strip("\u00f1") == "n") // n-tilde
    assert(strip("\u00df") == "\u00df") // sharp-s: no decomposition
    assert(strip("\u0153uf") == "\u0153uf") // oe ligature survives
    assert(strip("\ud55c") == "\ud55c") // hangul: jamo aren't marks
    assert(strip("x\u0327y") == "xy") // bare combining cedilla dropped
    assert(strip("abc 123") == "abc 123") // ASCII fast path
  }

  test("expressions run through codegen, null-propagate, and register in SQL") {
    val df = Seq(Some("e\u0301 o\u0303"), Some("plain"), None).toDF("s")
    val got = df.select(
        UnicodeNative.nfc_normalize($"s").as("n"),
        UnicodeNative.strip_accents($"s").as("a"))
      .as[(Option[String], Option[String])].collect().toSeq
    assert(got.contains((Some("\u00e9 \u00f5"), Some("e o"))))
    assert(got.contains((Some("plain"), Some("plain"))))
    assert(got.contains((None, None)))

    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT strip_accents(nfc_normalize('e\u0301a\u0300')) AS x")
      .as[String].head()
    assert(viaSql == "ea")
  }
}
