package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sim, Text}

/** Batch-18 operators (round 7): intra-doc repetition gates,
  * Jelinek-Mercer interpolated LM scoring, k-means cluster purity.
  */
class Batch18OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetitionSignals: hand-computed diversity, run, and bigram mode") {
    val docs = Seq(
      (1L, "a a a b"),         // run of 3, top bigram (a,a) x2
      (2L, "x y x y x"),       // alternating: run 1, (x,y) x2 of 4 bigrams
      (3L, "solo"),            // single token: no bigram
      (4L, "w w w w")          // fully degenerate
    ).toDF("doc_id", "text")
    val got = Text.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) === ((4L, 0.5, 3L, 1.0)))     // 2 distinct/4; 2*2/4
    assert(got(2L) === ((5L, 0.4, 1L, 0.8)))     // 2/5; (x,y) twice: 2*2/5
    assert(got(3L) === ((1L, 1.0, 1L, 0.0)))     // no bigrams -> 0
    assert(got(4L) === ((4L, 0.25, 4L, 1.5)))    // (w,w) x3: 2*3/4
  }

  test("interpolatedLogProb at lambda=1 equals bigramLogProb exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("doc_id"), col("text"))
    val a = Text.interpolatedLogProb(docs, 1.0)
      .select(col("doc_id"), col("n_bigrams"), col("interp_logprob").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Text.bigramLogProb(docs)
      .select(col("doc_id"), col("n_bigrams"), col("bigram_logprob").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    CacheScope.flush()
    assert(a.nonEmpty && a === b)
  }

  test("interpolatedLogProb at lambda=0 scores word choice alone (hand case)") {
    // corpus bigrams: (a b) x2 from doc1, (a c) x1 from doc2.
    // continuation counts: b=2, c=1, total=3.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // doc1: bigrams (a,b) x2 and (b,a) x1 -> wait: tokens a b a b gives
    // (a,b),(b,a),(a,b): continuations b=2, a=1. Corpus adds (a,c).
    // Recompute: continuations: b:2, a:1, c:1, total 4.
    // doc1 score = (2*ln(2/4) + 1*ln(1/4)) / 3; doc2 = ln(1/4).
    val exp1 = math.rint(((2 * math.log(2.0 / 4) + math.log(1.0 / 4)) / 3) * 1e4) / 1e4
    val exp2 = math.rint(math.log(1.0 / 4) * 1e4) / 1e4
    val got = Text.interpolatedLogProb(docs, 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    CacheScope.flush()
    assert(math.abs(got(1L) - exp1) < 1e-9, s"doc1: ${got(1L)} vs $exp1")
    assert(math.abs(got(2L) - exp2) < 1e-9, s"doc2: ${got(2L)} vs $exp2")
  }

  test("ngramNovelty: originals own their shingles, copies score zero, fresh text scores one") {
    val docs = Seq(
      (1L, "a b c d e f"),        // original: 4 shingles, all first-seen here
      (2L, "a b c d e f"),        // exact later copy: nothing novel
      (3L, "x y z w v"),          // fresh: fully novel
      (4L, "a b c q r s")         // partial overlap: shares (a b c) only
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.ngramNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    CacheScope.flush()
    assert(got(1L) === ((4L, 4L, 1.0)))
    assert(got(2L) === ((4L, 0L, 0.0)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(got(4L) === ((4L, 3L, 0.75)))  // (a b c) attributed to doc 1
  }

  test("clusterSizeHistogram: sizes partition the corpus; composes over any keeper frame") {
    val keepers = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),     // triple
      (4L, 4L), (5L, 4L),               // pair
      (6L, 6L), (7L, 7L)                // singletons
    ).toDF("doc_id", "keep_id")
    val got = graft.ops.Dedup.clusterSizeHistogram(keepers).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    assert(got.values.map(_._2).sum === 7L, "n_docs must partition the corpus")
  }

  test("recencyScore: whole-half-life halvings, anchor cutoff, hand-computed") {
    val day = 86400000000L
    val anchor = 10 * day
    val ev = Seq(
      // user 1: value 8 at age 0d (w=1), value 8 at age 2d (w=1/2: one 2d half-life)
      (1L, Some(1L), anchor, 8.0), (2L, Some(1L), anchor - 2 * day, 8.0),
      // user 2: value 4 at age 5d -> floor(2.5)=2 halvings -> 1
      (3L, Some(2L), anchor - 5 * day, 4.0),
      // beyond the anchor and NULL user: excluded
      (4L, Some(1L), anchor + day, 100.0), (5L, None, anchor, 100.0)
    ).toDF("event_id", "user_id", "ts_us", "value")
    val got = graft.ops.EventOps.recencyScore(ev, anchor, halflifeDays = 2.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, anchor, 12.0)))
    assert(got(2L) === ((1L, anchor - 5 * day, 1.0)))
    assert(got.size === 2)
  }

  test("recencyScore: a NULL value contributes nothing instead of poisoning the user's fold") {
    val day = 86400000000L
    val anchor = 10 * day
    val ev = Seq(
      (1L, Some(1L), anchor, Some(8.0)),
      (2L, Some(1L), anchor - 2 * day, None), // NULL value: skipped, like sum()
      (3L, Some(2L), anchor, Some(4.0))
    ).toDF("event_id", "user_id", "ts_us", "value")
    val got = graft.ops.EventOps.recencyScore(ev, anchor, halflifeDays = 2.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // n_events still counts the NULL-value row; the score fold skips it
    assert(got(1L) === ((2L, 8.0)))
    assert(got(2L) === ((1L, 4.0)))
  }

  test("clusterPurity: planted label-aligned clusters read as pure, mixed as impure") {
    // two tight blobs on orthogonal axes; blob A all label 0, blob B
    // half 1 half 2 -> one pure cell and one 0.5 cell (labels tie-break
    // to the smaller)
    val dim = 8
    def vec(axis: Int, eps: Double) =
      Array.tabulate(dim)(i => (if (i == axis) 1.0 else 0.0) + (if (i == (axis + 1) % dim) eps else 0.0))
    val rows = (0 until 20).map { i =>
      (i.toLong, vec(0, 0.01 * (i % 5)).map(_.toFloat), 0)
    } ++ (20 until 40).map { i =>
      (i.toLong, vec(4, 0.01 * (i % 5)).map(_.toFloat), if (i % 2 == 0) 1 else 2)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Sim.clusterPurity(emb, nCells = 2, iters = 4, sampleMod = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.length === 2)
    val byPop = got.sortBy(_._2)
    assert(byPop(0) === ((20L, 0, 1.0)), s"pure blob: ${byPop.toSeq}")
    assert(byPop(1) === ((20L, 1, 0.5)), s"mixed blob ties to smaller label: ${byPop.toSeq}")
  }
}
