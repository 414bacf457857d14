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

  test("no oracle SQL uses a NOT IN subquery (NULL-semantics footgun)") {
    // `x NOT IN (SELECT ...)` yields NULL (not true) whenever the subquery
    // produces a NULL, silently dropping rows — the dq_audit r9 lesson.
    // Anti-joins in oracle SQL must be spelled NOT EXISTS, whose semantics
    // match Spark's left_anti join for nullable columns.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.toUpperCase.replaceAll("\\s+", " ")
        .contains("NOT IN (SELECT") => name
    }
    assert(offenders.isEmpty, s"oracle SQL with NOT IN subqueries: $offenders")
  }
}
