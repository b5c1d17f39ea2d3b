package graft.misc

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Driver-contract invariants: a registration mistake here would silently
  * zero part of the round's correctness score (an oracle without a verify
  * output counts as FAIL; a duplicate name shadows a query).
  */
class ContractSpec extends AnyFunSuite {

  private val names = SparkEntry.providers.flatMap(_.all).map(_.name)

  test("query names are unique across providers") {
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("every oracle belongs to a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every bench name is a registered query") {
    val missing = SparkEntry.benchNames.toSet -- SparkEntry.allQueries.keySet
    assert(missing.isEmpty, s"bench names without queries: $missing")
  }

  test("every gate query except deliberate rows-only ones has an oracle") {
    // Rows-only gate entries are a weaker driver check; each one must be a
    // conscious decision. Today there are NONE — ls08 (the only formerly
    // rows-only entry) moved to the bench/stress tier (gate = false).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"gate queries without oracles: $rowsOnly")
  }

  test("gate=false queries stay covered by bench or stress") {
    val offGate = SparkEntry.providers.flatMap(_.all).filterNot(_.gate)
    val uncovered = offGate.filterNot(q =>
      q.bench || graft.Stress.Targets.contains(q.name)).map(_.name)
    assert(uncovered.isEmpty, s"gate=false queries nothing exercises: $uncovered")
  }
}
