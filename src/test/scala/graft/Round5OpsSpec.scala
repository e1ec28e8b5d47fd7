package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, EventOps, Multimodal, Relational, Text}

/** Round-5 operator batch, pinned by hand-computed fixtures: bigram
  * LM scoring, BPE pair counting, overlapping chunking, per-domain
  * capping, last-touch attribution, media chunk planning, and
  * equal-count banding.
  */
class Round5OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigramLogProb: hand-computed conditional log-probs; short docs drop out") {
    // corpus bigrams: (a b) x2 [docs 1, 2], (b a) x1 [doc 2]
    // contexts: a -> 2 total, b -> 1 total
    val docs = Seq(
      (1L, "a b"),      // one bigram (a,b): ln(2/2) = 0
      (2L, "a b a"),    // bigrams (a,b), (b,a): avg(ln(2/2), ln(1/1)) = 0
      (3L, "solo"),     // no bigram -> absent from output
      (4L, "x y")       // (x,y): ln(1/1) = 0
    ).toDF("doc_id", "text")
    val out = Text.bigramLogProb(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out === Array((1L, 1L, 0.0), (2L, 2L, 0.0), (4L, 1L, 0.0)))
  }

  test("bigramLogProb: rare continuations score below common ones") {
    // context 'the': 3 bigrams, 'the cat' x2, 'the dog' x1
    val docs = Seq(
      (1L, "the cat"), (2L, "the cat"), (3L, "the dog")
    ).toDF("doc_id", "text")
    val out = Text.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === out(2L))
    assert(out(3L) < out(1L)) // ln(1/3) < ln(2/3)
    assert(out(1L) === -0.4055) // round(ln(2/3), 4)
  }

  test("bpePairCounts: adjacent char pairs within words, count desc") {
    // "abab": ab, ba, ab ; "ab": ab ; "c": filtered (len 1)
    val docs = Seq((1L, "abab ab c")).toDF("doc_id", "text")
    val out = Text.bpePairCounts(docs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("ab", 3L), ("ba", 1L)))
  }

  test("chunkDocs: 200/50 windows advance by 150; short doc = one chunk") {
    val text450 = ("x" * 450)
    val docs = Seq((1L, text450), (2L, "short")).toDF("doc_id", "text")
    val out = Corpus.chunkDocs(docs, chunkSize = 200, overlap = 50)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // doc 1: len 450 -> offsets 1, 151, 301 (sequence to 450-50=400)
    //   chunk lens 200, 200, 150
    assert(out === Array(
      (1L, 0L, 1L, 200L), (1L, 1L, 151L, 200L), (1L, 2L, 301L, 150L),
      (2L, 0L, 1L, 5L)))
  }

  test("chunkDocs: consecutive chunks overlap by exactly `overlap` chars") {
    val docs = Seq((1L, (1 to 300).map(i => ('a' + i % 26).toChar).mkString)).toDF("doc_id", "text")
    val chunks = Corpus.chunkDocs(docs, chunkSize = 200, overlap = 50)
      .orderBy("chunk_id").select("chunk").as[String].collect()
    assert(chunks(0).takeRight(50) === chunks(1).take(50))
  }

  test("domainCap: keeps top-cap per domain by (order desc, doc_id asc)") {
    val docs = Seq(
      (1L, "s1", 0.9), (2L, "s1", 0.9), (3L, "s1", 0.5),
      (4L, "s2", 0.1)
    ).toDF("doc_id", "source", "quality")
    val out = Corpus.domainCap(docs, "source", "quality", cap = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // s1: ties at 0.9 -> doc 1 rnk 1, doc 2 rnk 2; doc 3 dropped; s2: doc 4 rnk 1
    assert(out === Array((1L, 1L), (2L, 2L), (4L, 1L)))
  }

  test("lastTouchAttribution: strictly-preceding touch; NULL when none") {
    val ev = Seq(
      // user 10: click@100, purchase@200 -> touch 100, gap 100
      (1L, 10L, 100L, "click"), (2L, 10L, 200L, "purchase"),
      // user 20: purchase@50 with no earlier click -> NULL
      (3L, 20L, 50L, "purchase"), (4L, 20L, 60L, "click"),
      // user 30: click@5, click@7, purchase@7 (tie ts; click event_id 6 < 7
      // orders before the purchase) -> touch 7
      (5L, 30L, 5L, "click"), (6L, 30L, 7L, "click"), (7L, 30L, 7L, "purchase")
    ).toDF("event_id", "user_id", "ts_us", "event_type")
    val out = EventOps.lastTouchAttribution(ev, "ts_us", "event_type", "click", "purchase")
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out === Array((2L, 100L), (3L, -1L), (7L, 7L)))
  }

  test("chunkPlan: exact-multiple, remainder, and sub-chunk payloads") {
    val media = Seq((1L, 200L), (2L, 250L), (3L, 40L)).toDF("media_id", "n_bytes")
    val out = Multimodal.chunkPlan(media, chunkBytes = 100L)
      .orderBy("media_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, 0L, 0L, 100L), (1L, 1L, 100L, 100L),
      (2L, 0L, 0L, 100L), (2L, 1L, 100L, 100L), (2L, 2L, 200L, 50L),
      (3L, 0L, 0L, 40L)))
  }

  test("assignSplit: stable assignment, boundaries honored, roughly proportional") {
    val docs = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val cuts = Seq(("train", 0.9), ("val", 0.95), ("test", 1.0))
    val out = Corpus.assignSplit(docs, cuts)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 850 && counts("train") < 950, counts.toString)
    // re-running assigns identically (pure function of doc_id)
    val again = Corpus.assignSplit(docs, cuts)
    assert(out.select("doc_id", "split").except(again.select("doc_id", "split")).count() === 0)
    // every u respects its split's boundaries
    val bad = out.filter(
      (col("split") === "train" && col("u_r") >= 0.9) ||
      (col("split") === "val" && (col("u_r") < 0.9 || col("u_r") >= 0.95)) ||
      (col("split") === "test" && col("u_r") < 0.95)).count()
    assert(bad === 0)
  }

  test("assignSplit: membership is independent of corpus size (no migration)") {
    val cuts = Seq(("train", 0.9), ("test", 1.0))
    val small = Corpus.assignSplit(
      (0L until 100L).map(i => (i, "")).toDF("doc_id", "text"), cuts)
    val large = Corpus.assignSplit(
      (0L until 500L).map(i => (i, "")).toDF("doc_id", "text"), cuts)
    val smallMap = small.select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val largeMap = large.select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(smallMap.forall { case (id, s) => largeMap(id) === s })
  }

  test("stratifiedSampleN: exact N per stratum, deterministic, undersized strata intact") {
    val docs = ((0L until 100L).map(i => (i, "en")) ++ (100L until 105L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val out = Corpus.stratifiedSampleN(docs, "lang", n = 10)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("en" -> 10L, "de" -> 5L))
    // deterministic: same members on a re-run
    val again = Corpus.stratifiedSampleN(docs, "lang", n = 10)
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
  }

  test("ntileStats: equal-count bands with deterministic boundaries") {
    val df = (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("k", "v")
    val out = Relational.ntileStats(df, "v", "k", n = 2)
      .orderBy("tile")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out === Array((1L, 5L, 10.0, 50.0), (2L, 5L, 60.0, 100.0)))
  }
}
