package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, Text}

/** Batch-15 operator fixtures: the hashing-trick text embedding,
  * skip-gram pair extraction, and the deterministic reservoir sample.
  */
class Batch15OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- hashedBowVectors ----------------------------------------------------

  test("hashedBowVectors: identical texts embed identically; counts scale the value") {
    val docs = Seq((1L, "a b a"), (2L, "a b a"), (3L, "a b")).toDF("doc_id", "text")
    val out = Text.hashedBowVectors(docs, 64).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    assert(out(1L) === out(2L))
    // doc 3 differs from doc 1 exactly in one 'a' occurrence
    val aBucketDelta = (out(1L) -- out(3L)) ++ (out(3L) -- out(1L))
    assert(aBucketDelta.nonEmpty)
  }

  test("hashedBowVectors: signed sums cancel only token-for-token") {
    // one token maps to (bucket, sign); two of it doubles v, never zeroes it
    val docs = Seq((1L, "w w")).toDF("doc_id", "text")
    val out = Text.hashedBowVectors(docs, 64).collect()
    assert(out.length === 1)
    assert(math.abs(out.head.getLong(2)) === 2L)
  }

  // ---- skipgramPairs -------------------------------------------------------

  test("skipgramPairs: window 1 on 'a b c' yields the adjacency multiset") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = Text.skipgramPairs(docs, 1).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out === Map(
      ("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L))
  }

  test("skipgramPairs: no wrap-around — edge tokens never pair across the boundary") {
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = Text.skipgramPairs(docs, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // with naive negative indexing, i=1 o=-1 would wrap to the LAST token
    assert(out === Set(("x", "y", 1L), ("y", "x", 1L)))
  }

  test("skipgramPairs: pair counts are symmetric (undirected corpus property)") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val out = Text.skipgramPairs(docs, 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    out.foreach { case ((c, x), n) =>
      assert(out((x, c)) === n, s"asymmetric pair ($c,$x)")
    }
  }

  // ---- reservoirSample -----------------------------------------------------

  test("reservoirSample: exact n, repartition-invariant, nested under a larger sample") {
    val docs = (1L to 500L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val s10 = Corpus.reservoirSample(docs, 10).collect().map(_.getLong(0)).toSet
    val s10b = Corpus.reservoirSample(docs.repartition(13), 10)
      .collect().map(_.getLong(0)).toSet
    val s50 = Corpus.reservoirSample(docs, 50).collect().map(_.getLong(0)).toSet
    assert(s10.size === 10)
    assert(s10 === s10b, "the sample must not depend on physical layout")
    assert(s10.subsetOf(s50), "hash-rank samples are nested by construction")
  }
}
