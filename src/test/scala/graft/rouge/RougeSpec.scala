package graft.rouge

import org.scalatest.funsuite.AnyFunSuite

class RougeSpec extends AnyFunSuite {

  test("rouge1 hand example") {
    val s = Rouge.rougeN("the cat sat", "the cat ran", 1)
    assert(math.abs(s.precision - 2.0 / 3) < 1e-12)
    assert(math.abs(s.recall - 2.0 / 3) < 1e-12)
    assert(math.abs(s.f1 - 2.0 / 3) < 1e-12)
  }

  test("rouge2 hand example") {
    val s = Rouge.rougeN("the cat sat", "the cat ran", 2)
    assert(math.abs(s.precision - 0.5) < 1e-12)
    assert(math.abs(s.f1 - 0.5) < 1e-12)
  }

  test("rougeL LCS non-contiguous") {
    // sys: a b c d ; ref: a x c d -> LCS = a c d = 3
    val s = Rouge.rougeL("a b c d", "a x c d")
    assert(math.abs(s.precision - 0.75) < 1e-12)
    assert(math.abs(s.recall - 0.75) < 1e-12)
  }

  test("multiset overlap counts duplicates with min()") {
    val s = Rouge.rougeN("go go go", "go go stop", 1)
    assert(math.abs(s.precision - 2.0 / 3) < 1e-12)
    assert(math.abs(s.recall - 2.0 / 3) < 1e-12)
  }

  test("zero overlap and empty inputs") {
    assert(Rouge.rougeN("aa bb", "cc dd", 1) == Rouge.Score(0, 0, 0))
    assert(Rouge.rougeN("", "cc", 1) == Rouge.Score(0, 0, 0))
    assert(Rouge.rougeL("", "", false) == Rouge.Score(0, 0, 0))
  }

  test("stemmer applies only to tokens longer than 3 chars (rouge-score quirk)") {
    val s = Rouge.rougeN("running", "run", 1, stem = true)
    assert(s.f1 == 1.0) // running -> run; "run" (len 3) untouched
    val t = Rouge.rougeN("cats", "cat", 1, stem = true)
    assert(t.f1 == 1.0) // cats (len 4) -> cat
  }

  test("tokenization: alnum runs of lowercased text") {
    assert(Rouge.tokenize("It's 42%, ok?") == Seq("it", "s", "42", "ok"))
  }

  test("bounds: 0 <= P,R,F <= 1") {
    for ((a, b) <- Seq(("x y z", "x"), ("a a a a", "a b"), ("q", "q q q"))) {
      val s = Rouge.rougeN(a, b, 1)
      assert(s.precision >= 0 && s.precision <= 1)
      assert(s.recall >= 0 && s.recall <= 1)
      assert(s.f1 >= 0 && s.f1 <= 1)
    }
  }
}
