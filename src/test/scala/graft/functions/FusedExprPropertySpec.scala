package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based bit-parity for the fused expressions' kernels, against
  * straight-line Scala references of the HOF semantics they replaced —
  * randomized inputs INCLUDING the hostile corners the fixed-example
  * specs can't enumerate: NaN, ±Infinity, signed zeros, null elements,
  * length mismatches, empty arrays, multi-byte codepoints. Deterministic
  * seed (CI-stable).
  */
class FusedExprPropertySpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(99L)
    (0 until n).foreach { _ =>
      val r = gen.doPureApply(Gen.Parameters.default, seed)
      f(r.retrieve.get)
      seed = r.seed
    }
  }

  private val hostileDouble: Gen[java.lang.Double] = Gen.frequency(
    12 -> Gen.choose(-1e3, 1e3).map(java.lang.Double.valueOf),
    1 -> Gen.const(java.lang.Double.valueOf(Double.NaN)),
    1 -> Gen.const(java.lang.Double.valueOf(Double.PositiveInfinity)),
    1 -> Gen.const(java.lang.Double.valueOf(Double.NegativeInfinity)),
    1 -> Gen.const(java.lang.Double.valueOf(-0.0)),
    1 -> Gen.const(null: java.lang.Double))

  private val dArray: Gen[Array[Any]] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, hostileDouble).map(_.toArray[Any]))

  /** Reference: aggregate(zip_with(a, b, f), 0.0, +) left fold. */
  private def refFold(a: Array[Any], b: Array[Any],
      f: (Double, Double) => Double): Option[Double] = {
    if (a.length != b.length) return None
    var s = 0.0
    var i = 0
    while (i < a.length) {
      if (a(i) == null || b(i) == null) return None
      s += f(a(i).asInstanceOf[Double], b(i).asInstanceOf[Double])
      i += 1
    }
    Some(s)
  }

  private def bits(x: Double): Long = java.lang.Double.doubleToRawLongBits(x)

  test("DotProduct/SqDist: bit-equal to the fold reference on hostile doubles") {
    forAllN(Gen.zip(dArray, dArray)) { case (a, b) =>
      val (ad, bd) = (new GenericArrayData(a), new GenericArrayData(b))
      val dot = DotProduct.compute(ad, bd)
      val ref = refFold(a, b, (x, y) => x * y)
      assert((dot == null) == ref.isEmpty)
      ref.foreach(r => assert(bits(dot) == bits(r)))
      val sq = SqDist.compute(ad, bd)
      val refSq = refFold(a, b, (x, y) => (x - y) * (x - y))
      assert((sq == null) == refSq.isEmpty)
      refSq.foreach(r => assert(bits(sq) == bits(r)))
    }
  }

  test("SelfDot: bit-equal to the Σx² fold reference on hostile doubles") {
    forAllN(dArray) { a =>
      val sd = SelfDot.compute(new GenericArrayData(a))
      val ref = refFold(a, a, (x, y) => x * y)
      assert((sd == null) == ref.isEmpty)
      ref.foreach(r => assert(bits(sd) == bits(r)))
      // and identical to the binary kernel applied to the same buffer
      val dd = DotProduct.compute(new GenericArrayData(a), new GenericArrayData(a))
      assert((sd == null) == (dd == null))
      if (sd != null) assert(bits(sd) == bits(dd))
    }
  }

  private val hostileLong: Gen[java.lang.Long] = Gen.frequency(
    10 -> Gen.choose(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
    1 -> Gen.const(null: java.lang.Long))

  test("MinHashSig: equals the min-over-permutation reference incl. nulls") {
    val gen = Gen.zip(
      Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, hostileLong).map(_.toArray[Any])),
      Gen.choose(1, 16))
    forAllN(gen) { case (hs, n) =>
      val sig = MinHashSig.compute(new GenericArrayData(hs), n)
      assert(sig.numElements() == n)
      (0 until n).foreach { i =>
        val vals = hs.collect { case h: java.lang.Long => Fnv.hashPerm(i, h) }
        if (vals.isEmpty) assert(sig.isNullAt(i))
        else assert(sig.getLong(i) == vals.min)
      }
    }
  }

  private val token: Gen[String] = Gen.frequency(
    8 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
    1 -> Gen.const("日本語"),
    1 -> Gen.const("wörd"))
  private val tokArray: Gen[Array[Any]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n,
      Gen.frequency(9 -> token.map(UTF8String.fromString),
        1 -> Gen.const(null: UTF8String))).map(_.toArray[Any]))

  test("SimHash64: equals the per-bit vote reference incl. null tokens") {
    forAllN(tokArray) { toks =>
      val got = SimHash64.compute(new GenericArrayData(toks))
      var out = 0L
      (0 until 64).foreach { b =>
        val vote = toks.map {
          case null => -1
          case t: UTF8String =>
            if (((Fnv.hashUtf8(t) >>> b) & 1L) == 1L) 1 else -1
        }.sum
        if (vote > 0) out |= (1L << b)
      }
      assert(got == out)
    }
  }

  test("WordShingles: equals the array_join sliding reference") {
    forAllN(Gen.zip(tokArray, Gen.choose(1, 5))) { case (toks, n) =>
      val got = WordShingles.compute(new GenericArrayData(toks), n)
      if (toks.length < n) assert(got.numElements() == 0)
      else {
        assert(got.numElements() == toks.length - n + 1)
        (0 to toks.length - n).foreach { i =>
          val expect = toks.slice(i, i + n).collect {
            case t: UTF8String => t.toString
          }.mkString(" ")
          assert(got.getUTF8String(i).toString == expect, s"window $i")
        }
      }
    }
  }

  private val uniText: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.frequency(
      10 -> Gen.alphaLowerChar, 1 -> Gen.const('本'), 1 -> Gen.const('ö')))
      .map(_.mkString))

  test("CharNgrams: equals the codepoint-window reference") {
    forAllN(Gen.zip(uniText, Gen.choose(1, 4))) { case (s, n) =>
      val got = CharNgrams.compute(UTF8String.fromString(s), n)
      val cps = s.codePoints().toArray
      if (cps.length < n) assert(got.numElements() == 0)
      else {
        assert(got.numElements() == cps.length - n + 1)
        (0 to cps.length - n).foreach { i =>
          val expect = new String(cps, i, n)
          assert(got.getUTF8String(i).toString == expect, s"window $i of '$s'")
        }
      }
    }
  }
}
