package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.rouge.Rouge
import graft.text.{Lemmatizer, PorterStemmer}

/** Property-based invariants (SURVEY.md §5.2), driven by scalacheck
  * generators with a fixed seed (deterministic CI).
  */
class PropertySpec extends AnyFunSuite {

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private val words: Gen[List[String]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, word))

  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      val r = gen.doPureApply(Gen.Parameters.default, seed)
      f(r.retrieve.get)
      seed = r.seed
    }
  }

  test("rouge: 0 <= P,R,F <= 1 and F=0 iff zero overlap") {
    forAllN(Gen.zip(text, text)) { case (a, b) =>
      for (s <- Seq(Rouge.rougeN(a, b, 1), Rouge.rougeN(a, b, 2), Rouge.rougeL(a, b))) {
        assert(s.precision >= 0 && s.precision <= 1)
        assert(s.recall >= 0 && s.recall <= 1)
        assert(s.f1 >= 0 && s.f1 <= 1 + 1e-12)
        assert((s.f1 == 0) == (s.precision == 0 || s.recall == 0))
      }
    }
  }

  test("rouge-N F symmetric; P and R swap under argument swap") {
    forAllN(Gen.zip(text, text)) { case (a, b) =>
      val xy = Rouge.rougeN(a, b, 1)
      val yx = Rouge.rougeN(b, a, 1)
      assert(math.abs(xy.f1 - yx.f1) < 1e-12)
      assert(math.abs(xy.precision - yx.recall) < 1e-12)
    }
  }

  test("rouge self-comparison is perfect for non-empty text") {
    forAllN(text) { a =>
      if (a.trim.nonEmpty) {
        val s = Rouge.rougeN(a, a, 1)
        assert(s.precision == 1.0 && s.recall == 1.0 && s.f1 == 1.0)
      }
    }
  }

  test("stemmer output is lowercase alpha and never longer than input") {
    forAllN(word) { w =>
      val s = PorterStemmer.stem(w)
      assert(s.length <= w.length)
      assert(s.forall(c => c >= 'a' && c <= 'z'))
    }
  }

  test("lemmatizer is deterministic and total") {
    forAllN(word) { w =>
      val l = Lemmatizer.lemma(w)
      assert(l == Lemmatizer.lemma(w))
      assert(l.nonEmpty)
    }
  }

  test("LCS bounded by both inputs; exact on self; monotone under concat") {
    forAllN(Gen.zip(words, words)) { case (a, b) =>
      val l = Rouge.lcsLength(a, b)
      assert(l <= math.min(a.length, b.length))
      assert(Rouge.lcsLength(a, a) == a.length)
      assert(Rouge.lcsLength(a ++ b, b) >= l)
    }
  }
}
