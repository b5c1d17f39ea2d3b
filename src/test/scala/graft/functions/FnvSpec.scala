package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Pins the FNV-1a family to the published test vectors (the fixed point
  * the d04/d05/tr06 oracles replicate in SQL) and exercises the codegen
  * path through a DataFrame.
  */
class FnvSpec extends SparkSpec {
  import spark.implicits._

  test("fnv1a64 matches the published FNV-1a 64-bit test vectors") {
    def h(s: String): Long = Fnv.hashUtf8(UTF8String.fromString(s))
    assert(h("") == 0xcbf29ce484222325L) // offset basis
    assert(h("a") == 0xaf63dc4c8601ec8cL)
    assert(h("foobar") == 0x85944171f73967e8L)
  }

  test("expressions evaluate identically through codegen and interpreter") {
    val df = Seq("", "a", "foobar", "spark graft", "日本語").toDF("s")
    val viaDf = df.select($"s", Fnv.fnv1a64($"s").as("h"))
      .as[(String, Long)].collect().toMap
    viaDf.foreach { case (s, got) =>
      assert(got == Fnv.hashUtf8(UTF8String.fromString(s)), s)
    }
    val perm = Seq((3, 42L), (0, 0L), (255, -1L)).toDF("i", "h")
      .select($"i", $"h", Fnv.fnv1a_perm($"i", $"h").as("p"))
      .as[(Int, Long, Long)].collect()
    perm.foreach { case (i, h, p) => assert(p == Fnv.hashPerm(i, h)) }
  }

  test("sql registration surfaces the functions") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT fnv1a64('foobar') AS h, fnv1a_perm(1, 2) AS p")
      .as[(Long, Long)].head()
    assert(r._1 == 0x85944171f73967e8L)
    assert(r._2 == Fnv.hashPerm(1, 2L))
  }
}
