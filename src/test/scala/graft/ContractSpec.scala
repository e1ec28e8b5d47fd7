package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's internal consistency: every declared query
  * has an oracle, names are well-formed, and the flagship entry
  * produces rows (the t1 gate). Scala's Map(...) silently keeps the
  * last duplicate key, so a copy-paste slip would otherwise drop a
  * query without any compile error.
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle names a declared query; only the named exceptions lack one") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // k-means IVF is deliberately oracle-less (Lloyd's in SQL isn't worth
    // mirroring); its contract is KmeansIvfSpec's recall bound. Driver
    // records the weaker rows-only check for it.
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ===
      Set("q_sim_ann_kmeans"))
  }

  test("query names are well-formed") {
    assert(SparkEntry.queries.keySet.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("declared inventory has the expected size") {
    assert(SparkEntry.queries.size === 136)
  }

  test("entry (t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}
