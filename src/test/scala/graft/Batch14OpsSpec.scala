package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, Mutations, Text}

/** Batch-14 operator fixtures: winnowing fingerprints, the
  * point-in-time SCD2 lookup, length-bucket batching audit,
  * deterministic interleave, and split-leakage detection.
  */
class Batch14OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- winnow --------------------------------------------------------------

  test("winnow: identical documents produce identical fingerprint sets") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    val out = Text.winnow(docs, 3, 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    assert(out(1L) === out(2L))
    assert(out(1L).nonEmpty)
  }

  test("winnow: the 2/(w+1) density holds loosely and every doc with >= w grams is covered") {
    val text = (1 to 60).map(i => s"t${i * 7919 % 101}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = Text.winnow(docs, 3, 4).count()
    // 58 grams, 55 windows: winnowing keeps ~2/(w+1)=0.4 of positions,
    // bounded by [#windows/(w), #windows] in the worst cases
    assert(n >= 55L / 4 && n <= 55L, s"fingerprint count $n outside sane band")
  }

  test("winnow: docs sharing a long substring share a fingerprint (the MOSS guarantee)") {
    val shared = "p q r s t u v w x y z0 z1"  // 12 tokens >= w+k-1 = 6
    val docs = Seq(
      (1L, s"a b c d $shared"),
      (2L, s"$shared m n o p2"))
      .toDF("doc_id", "text")
    val fp = Text.winnow(docs, 3, 4).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "a >= w+k-1-token shared substring must yield a shared fingerprint hash")
  }

  // ---- pointInTimeJoin -----------------------------------------------------

  test("pointInTimeJoin: each fact reads the version valid AT its timestamp") {
    val ev = Seq(
      (1L, 100L, 1L, "bronze"), (1L, 200L, 2L, "gold"), (1L, 300L, 3L, "gold"))
      .toDF("user_id", "ts_us", "event_id", "tier")
    val dim = Mutations.scd2(ev, "user_id", "tier", "ts_us", "event_id")
    val facts = Seq((10L, 1L, 150L), (11L, 1L, 200L), (12L, 1L, 999L))
      .toDF("event_id", "user_id", "ts_us")
    val out = Mutations.pointInTimeJoin(facts, dim, "user_id", "ts_us", "tier")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("dim_tier"))))
    assert(out === Array(
      (10L, "bronze"),  // mid-interval
      (11L, "gold"),    // boundary: [valid_from, ...) includes its start
      (12L, "gold")))   // open current version
  }

  test("pointInTimeJoin: facts before the first version get NULL, not dropped") {
    val ev = Seq((1L, 100L, 1L, "bronze")).toDF("user_id", "ts_us", "event_id", "tier")
    val dim = Mutations.scd2(ev, "user_id", "tier", "ts_us", "event_id")
    val facts = Seq((10L, 1L, 50L)).toDF("event_id", "user_id", "ts_us")
    val out = Mutations.pointInTimeJoin(facts, dim, "user_id", "ts_us", "tier").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("dim_tier")))
  }

  // ---- lengthBuckets -------------------------------------------------------

  test("lengthBuckets: equal-count buckets, ordered ranges, waste from the bucket max") {
    val docs = (1L to 16L).map(i => (i, (1L to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Corpus.lengthBuckets(docs, 4).orderBy("bucket").collect()
    assert(out.length === 4)
    assert(out.forall(_.getLong(1) === 4L), "16 docs over 4 buckets = 4 each")
    // bucket 1 holds lengths 1..4: avg 2.5, max 4 -> waste 0.375
    assert(out.head.getDouble(out.head.fieldIndex("pad_waste_r")) === 0.375)
    val ranges = out.map(r => (r.getLong(r.fieldIndex("min_tok")), r.getLong(r.fieldIndex("max_tok"))))
    assert(ranges.sliding(2).forall { case Array(a, b) => a._2 <= b._1 },
      "bucket ranges must not interleave")
  }

  // ---- interleaveOrder -----------------------------------------------------

  test("interleaveOrder: the first |sources| rows visit every source once") {
    val docs = (1L to 40L).map(i => (i, s"src${i % 4}", "x")).toDF("doc_id", "source", "text")
    val out = Corpus.interleaveOrder(docs, "source", 40).collect()
    assert(out.take(4).map(_.getString(1)).toSet.size === 4,
      "rank-1 round must rotate through all 4 sources")
    assert(out.map(_.getLong(2)).sliding(2).forall { case Array(a, b) => a <= b })
  }

  // ---- splitLeakage --------------------------------------------------------

  test("splitLeakage: reports only cross-split exact duplicates") {
    // ids chosen so md5-split differs: scan a few candidates
    val base = (1L to 50L).map(i => (i, s"text$i"))
    val dups = Seq((101L, "text1"), (102L, "text1"))  // dups of doc 1 and each other
    val docs = (base ++ dups).toDF("doc_id", "text")
    val cuts = Seq(("train", 0.5), ("test", 1.0))
    val out = Corpus.splitLeakage(docs, cuts).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth from the same op's split assignment
    val split = Corpus.assignSplit(docs, cuts)
      .select(col("doc_id"), col("split"), col("text")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val expect = (for {
      (a, (sa, ta)) <- split; (b, (sb, tb)) <- split
      if a < b && ta == tb && sa != sb
    } yield (a, b)).toSet
    assert(out === expect)
    assert(out.forall { case (a, b) => split(a)._1 != split(b)._1 })
  }
}
