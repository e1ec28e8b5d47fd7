package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's internal consistency: every declared query
  * has an oracle, names are well-formed, and the flagship entry
  * produces rows (the t1 gate). Scala's Map(...) silently keeps the
  * last duplicate key, so a copy-paste slip would otherwise drop a
  * query without any compile error.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("query names are well-formed") {
    assert(SparkEntry.queries.keySet.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("declared inventory has the expected size") {
    assert(SparkEntry.queries.size === 61)
  }

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
