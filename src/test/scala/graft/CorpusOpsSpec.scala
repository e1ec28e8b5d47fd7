package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus

/** Corpus-assembly operators: packing invariants, shard determinism,
  * PII masking, and the Gopher quality signals on hand-computed
  * fixtures.
  */
class CorpusOpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("packSequences: offsets stay under budget and cumsum is consistent") {
    // shardSize 4 → docs 0-3 in shard 0, 4-7 in shard 1; budget 10
    val docs = Seq(
      (0L, "a b c"), (1L, "d e f g h i j"), (2L, "k l"), (3L, "m"),
      (4L, "n o p q r s t u v w x y z"), (5L, "aa"), (6L, "bb cc"), (7L, "dd")
    ).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, shardSize = 4, budget = 10)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // hand-walk shard 0: cum 3,10,12,13 → starts 0,3,10,12 → seq 0,0,1,1
    assert(out.take(4).toSeq === Seq(
      (0L, 0L, 3L, 0L, 0L), (1L, 0L, 7L, 0L, 3L),
      (2L, 0L, 2L, 1L, 0L), (3L, 0L, 1L, 1L, 2L)))
    // shard 1: doc 4 is 13 tokens (> budget): it owns seq 0 and doc 5
    // starts at offset 13 → seq 1
    assert(out.drop(4).toSeq === Seq(
      (4L, 1L, 13L, 0L, 0L), (5L, 1L, 1L, 1L, 3L),
      (6L, 1L, 2L, 1L, 4L), (7L, 1L, 1L, 1L, 6L)))
    // invariant: every offset < budget
    assert(out.forall(_._5 < 10))
  }

  test("shuffleShard: deterministic across runs, complete, rank-contiguous") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Corpus.shuffleShard(docs, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val b = Corpus.shuffleShard(docs, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet === b.toSet)          // seedless determinism
    assert(a.map(_._1).toSet === (0L until 200L).toSet) // a permutation, nothing lost
    assert(a.map(_._3).toSet.subsetOf((0L until 8L).toSet))
    // per-shard ranks are 1..n with no gaps
    a.groupBy(_._3).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // the permutation actually breaks locality: doc 0 and doc 1 are
    // not rank-adjacent in the same shard (md5 scatters them)
    val byDoc = a.map(r => r._1 -> (r._3, r._4)).toMap
    assert(byDoc(0L) !== ((byDoc(1L)._1, byDoc(1L)._2 - 1)))
  }

  test("piiMask redacts emails and phone runs, leaves prose alone") {
    val out = Seq(
      (1L, "write to jane.doe+x@corp.example.org today"),
      (2L, "call +1-555-0199 or 555-867-5309 now"),
      (3L, "no pii here, just words and the number 7")
    ).toDF("doc_id", "text")
      .select($"doc_id", Corpus.piiMask($"text").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) === "write to <EMAIL> today")
    assert(out(2L) === "call <PHONE> or <PHONE> now")
    assert(out(3L) === "no pii here, just words and the number 7")
  }

  test("gopherSignals on a hand-computed fixture") {
    val text = "aa bb aa bb aa" // 5 words, bigrams: [aa bb, bb aa, aa bb, bb aa] → 2 distinct of 4
    val r = Corpus.gopherSignals(Seq((1L, text)).toDF("doc_id", "text")).head()
    assert(r.getLong(1) === 5L)                 // n_words
    assert(r.getDouble(2) === 2.0)              // mean word length
    assert(r.getDouble(3) === 0.0)              // digit fraction
    assert(r.getDouble(4) === 0.5)              // dup bigram fraction
    assert(r.getLong(5) === 0L)                 // fails gate: < 10 words
    val ok = Corpus.gopherSignals(
      Seq((2L, (1 to 40).map(i => s"word$i").mkString(" "))).toDF("doc_id", "text")).head()
    assert(ok.getLong(5) === 1L)                // 40 distinct words pass
  }

  test("decontaminate flags exact and near copies, spares disjoint docs") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),   // exact copy: 6 shingles shared
      (2L, "alpha beta gamma delta epsilon zeta XX YY"),       // prefix overlap: 4 shared
      (3L, "totally different words with no overlap at all"),  // disjoint
      (100L, "alpha beta gamma delta epsilon zeta eta theta")  // the bench doc itself
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, bench, minShared = 5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 6L, 1L), (2L, 4L, 0L), (3L, 0L, 0L), (100L, 6L, 1L)))
  }

  test("weightedSample: weight-1 domains all pass, weight-0 and unlisted never do") {
    val docs = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "keep" else if (i % 3 == 1) "drop" else "unlisted"))
      .toDF("doc_id", "lang")
    val kept = Corpus.weightedSample(docs, "lang", Map("keep" -> 1.0, "drop" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.forall(_._2 == "keep"))
    assert(kept.length === 100) // every weight-1 doc, nothing else
    // determinism: identical verdict on a re-run
    val again = Corpus.weightedSample(docs, "lang", Map("keep" -> 1.0, "drop" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet === again.toSet)
  }

  test("weightedSample keeps roughly the weighted fraction") {
    val docs = (0L until 2000L).map(i => (i, "web")).toDF("doc_id", "lang")
    val n = Corpus.weightedSample(docs, "lang", Map("web" -> 0.5)).count()
    assert(n > 850 && n < 1150, s"kept $n of 2000 at weight 0.5")
  }

  test("gopherSignals survives degenerate docs") {
    val out = Corpus.gopherSignals(
      Seq((1L, ""), (2L, "solo"), (3L, "  ")).toDF("doc_id", "text"))
      .orderBy($"doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 1L, 0L)) // n_words
    assert(out.forall(_.getDouble(4) === 0.0))              // no bigrams → 0
  }
}
