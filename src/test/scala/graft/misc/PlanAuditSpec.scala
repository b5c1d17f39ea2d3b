package graft.misc

import graft.SparkSpec
import graft.tools.PlanAudit

/** Pins the nested-loop boundedness classifier behind the full-registry
  * plan audit (graft.tools.PlanAudit): a nested-loop join is acceptable
  * at corpus scale ONLY when its inner side is statically bounded — a
  * scalar aggregate, a top-k, a literal table — and the audit must keep
  * proving the bounded cases and keep flagging the unbounded ones, or
  * the whole-registry invariant silently rots.
  *
  * Verdicts are computed on `sparkPlan` (pre-preparation, so the tree is
  * traversable regardless of the session's AQE setting); the audit main
  * itself runs AQE-off executed plans, which only add exchanges — the
  * classifier recurses through unary nodes either way.
  */
class PlanAuditSpec extends SparkSpec {

  private def verdicts(name: String): (Int, Seq[String]) = {
    val q = graft.SparkEntry.queries(name)
    PlanAudit.nestedLoops(q(spark, sf("sf0.001")).queryExecution.sparkPlan)
  }

  test("a08's vocabulary-size cross join is proven bounded (scalar agg)") {
    val (bounded, unbounded) = verdicts("a08_bigram_lm")
    assert(bounded >= 1, "the crossJoin(broadcast(count)) must prove <= 1 row")
    assert(unbounded.isEmpty, s"no unbounded loop expected, got $unbounded")
  }

  test("c06 context packing has no nested loop at all") {
    val (bounded, unbounded) = verdicts("c06_context_packing")
    assert(bounded == 0 && unbounded.isEmpty)
  }

  test("d06's all-pairs truth leg is flagged unbounded (whitelist-only)") {
    val (_, unbounded) = verdicts("d06_cosine_neardup")
    assert(unbounded.nonEmpty,
      "the deliberate quadratic truth leg must NOT silently pass the audit")
    assert(PlanAudit.nestedLoopAllowed.contains("d06_cosine_neardup"),
      "…and must be carried by an explicit whitelist justification")
  }

  test("every whitelist entry names a registered query") {
    val all = graft.SparkEntry.allQueries.keySet
    val ghosts = PlanAudit.nestedLoopAllowed.keySet.filterNot(all.contains)
    assert(ghosts.isEmpty, s"whitelist entries without a query: $ghosts")
  }
}
