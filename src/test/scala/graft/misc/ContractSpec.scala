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
    val missing = SparkEntry.benchNames.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench names without queries: $missing")
  }
}
