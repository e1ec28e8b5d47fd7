package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Transitive dedup keeper (connected components) vs the one-hop rule,
  * on a hand-built duplicate CHAIN: doc 2 is the 18-token prefix of
  * doc 1 (22 tokens), doc 3 the 15-token prefix of doc 2. Distinct
  * tokens make shingle Jaccards pure count ratios:
  *   J(1,2) = 16/20 = 0.80   (edge at threshold 0.7)
  *   J(2,3) = 13/16 = 0.8125 (edge)
  *   J(1,3) = 13/20 = 0.65   (NO edge)
  * so 1-2-3 connect only transitively — exactly the input where the
  * one-hop keeper splits a duplicate cluster and CC must not.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val toks = (1 to 22).map(i => s"w$i")
  private val corpus = Seq(
    (1L, toks.mkString(" ")),
    (2L, toks.take(18).mkString(" ")),
    (3L, toks.take(15).mkString(" ")),
    (9L, "completely unrelated content over here with different words entirely today")
  ).toDF("doc_id", "text")

  test("verified edge set is exactly the chain links, not the transitive pair") {
    val edges = Dedup.verifiedNearDupPairs(corpus, minJaccard = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((1L, 2L), (2L, 3L)))
  }

  test("one-hop keeper splits the chain; connected components collapses it") {
    val oneHop = Dedup.lshDedupKeepers(corpus, minJaccard = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 3's only DIRECT neighbour is 2 → one-hop keeps 2, not 1
    assert(oneHop(3L) === 2L)

    val cc = Dedup.connectedComponentKeepers(corpus, minJaccard = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("CC label propagation converges on a longer chain (diameter > 2)") {
    // 5-doc chain via successive prefixes: each adjacent pair J ≥ 0.7,
    // non-adjacent pairs below. Lengths 40,33,27,22,18 → adjacent
    // shingle ratios 31/38≈0.82, 25/31≈0.81, 20/25=0.80, 16/20=0.80
    // (all edges); skip-one 25/38≈0.66, 20/31≈0.65, 16/25=0.64 (none).
    // Fixture chosen so every adjacent pair also COLLIDES in an LSH
    // band (banding is deterministic md5 math — verified offline; a
    // J≈0.8 pair has ~12% chance of missing all 4 bands, so not every
    // length vector works). Diameter 4 ⇒ needs ≥3 propagation rounds.
    val t = (1 to 40).map(i => s"t$i")
    val lens = Seq(40, 33, 27, 22, 18)
    val chain = lens.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, t.take(n).mkString(" "))
    }.toDF("doc_id", "text")
    val cc = Dedup.connectedComponentKeepers(chain, minJaccard = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }
}
