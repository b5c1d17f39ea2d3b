package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RecordLinkage.fellegiSunter (d21): weight signs and u estimation. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // 2 twin pairs (full agreement) + 6 non-match pairs where the rare
  // field agrees 1/6 and the common field agrees 5/6
  private val pairs = Seq(
    (1L, 1L, true, true), (2L, 2L, true, true),
    (1L, 2L, false, true), (2L, 1L, false, true),
    (1L, 3L, false, false), (2L, 3L, true, true),
    (3L, 1L, false, true), (3L, 2L, false, true)
  ).toDF("a_key", "b_key", "agree_rare", "agree_common")

  test("agreement on a rare field outweighs a common one") {
    val out = RecordLinkage.fellegiSunter(pairs,
        Seq("agree_rare", "agree_common"),
        Map("agree_rare" -> 0.95, "agree_common" -> 0.95),
        $"a_key" =!= $"b_key")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getBoolean(2), r.getBoolean(3), r.getDouble(4))).toSeq
    val twin = out.find(r => r._1 == 1L && r._2 == 1L).get._5
    val crossAgreeCommon = out.find(r => r._1 == 1L && r._2 == 2L).get._5
    val disagreeAll = out.find(r => r._1 == 1L && r._2 == 3L).get._5
    assert(twin > crossAgreeCommon && crossAgreeCommon > disagreeAll)
    assert(twin > 0 && disagreeAll < 0)
    // u_rare = 1/6 -> agreement weight ln(0.95/(1/6)) ~ 1.74;
    // u_common = 5/6 -> ln(0.95/(5/6)) ~ 0.131: rare dominates
    val rareOnly = math.log(0.95 / (1.0 / 6))
    val commonOnly = math.log(0.95 / (5.0 / 6))
    assert(math.abs(twin - (rareOnly + commonOnly)) < 1e-4)
  }

  test("degenerate blocking (zero non-match pairs) falls back to u=0.5, " +
    "never null scores") {
    // every pair is a self-pair -> the nonMatch filter selects nothing
    val selfOnly = Seq((1L, 1L, true), (2L, 2L, false))
      .toDF("a_key", "b_key", "ag")
    val out = RecordLinkage.fellegiSunter(selfOnly, Seq("ag"),
      Map("ag" -> 0.9), $"a_key" =!= $"b_key")
      .select($"a_key", $"ag", $"score").collect()
    assert(out.forall(r => !r.isNullAt(2)))
    // u=0.5: agree weight ln(0.9/0.5), disagree ln(0.1/0.5)
    val byKey = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(byKey(1L) - math.log(0.9 / 0.5)) < 1e-4)
    assert(math.abs(byKey(2L) - math.log(0.1 / 0.5)) < 1e-4)
    // the literal-weights path takes the same fallback
    val w = RecordLinkage.weightLiterals(selfOnly, Seq("ag"),
      Map("ag" -> 0.9), $"a_key" =!= $"b_key")
    assert(math.abs(w("ag")._1 - math.log(0.9 / 0.5)) < 1e-4)
  }

  test("clamping keeps fully-agreeing estimation fields finite") {
    val all = Seq((1L, 2L, true), (2L, 1L, true)).toDF("a_key", "b_key", "ag")
    val out = RecordLinkage.fellegiSunter(all, Seq("ag"),
      Map("ag" -> 0.9), $"a_key" =!= $"b_key").collect()
    assert(out.forall(r => !r.getDouble(3).isInfinite &&
      !r.getDouble(3).isNaN))
  }
}
