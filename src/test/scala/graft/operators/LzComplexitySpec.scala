package graft.operators

import graft.SparkSpec

/** TextAnalysis.lzPhrases (a31): hand-parsed LZ78 counts. */
class LzComplexitySpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String, prefix: Int = 200): Int =
    Seq(Tuple1(s)).toDF("text")
      .select(TextAnalysis.lzPhrases("text", prefix).as("n"))
      .collect().head.getInt(0)

  test("hand-parsed phrase counts") {
    assert(parse("aaaa") == 3)   // a | aa | a
    assert(parse("abab") == 3)   // a | b | ab
    assert(parse("abcd") == 4)   // all novel
    assert(parse("") == 0)
    assert(parse("aaaaaaaa") == 4) // a | aa | aaa | aa(tail)
  }

  test("prefix bound caps the parse") {
    assert(parse("abcdefgh", prefix = 4) == 4)
  }
}
