package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of [[SparkEntry]]: every oracle belongs
  * to a registered query, and every registered query is either oracled or
  * carries a declared rows-only manifest entry naming its twin/bound test
  * (VERDICT r6 task 8 — `no_oracle` in the correctness artifact must be
  * distinguishable from not-implemented). */
class EntryContractSpec extends AnyFunSuite {

  test("every oracleSql key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rowsOnly manifest covers exactly the queries without an oracle") {
    val expected = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val declared = SparkEntry.rowsOnly.keySet
    assert(declared == expected,
      s"undeclared rows-only: ${expected -- declared}; stale manifest entries: ${declared -- expected}")
  }

  test("rowsOnly reasons are substantive (name a twin or a bound test)")  {
    SparkEntry.rowsOnly.foreach { case (k, reason) =>
      assert(reason.length > 20, s"$k: reason too thin: '$reason'")
    }
  }
}
