package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Mutations, Text}

/** Batch-9 operator fixtures: MERGE upsert-with-update, SCD2 history
  * build, inverted index, bigram PMI, and text normalization — each
  * pinned by a hand-computed example including its edge cases
  * (update-sets-NULL, single-version keys, attribute flapping,
  * hapax pruning).
  */
class Batch9OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- mergeUpsert ---------------------------------------------------------

  test("mergeUpsert: update wins, insert appears, untouched keeps") {
    val base = Seq(("a", 1L, 10.0), ("b", 2L, 20.0)).toDF("k", "n", "v")
    val upd = Seq(("b", 5L, 50.0), ("c", 9L, 90.0)).toDF("k", "n", "v")
    val out = Mutations.mergeUpsert(base, upd, Seq("k"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(out === Array(
      ("a", 1L, 10.0, "keep"),
      ("b", 5L, 50.0, "update"),
      ("c", 9L, 90.0, "insert")))
  }

  test("mergeUpsert: a matched update's NULL overwrites (MERGE SET semantics)") {
    val base = Seq(("a", Some(10.0))).toDF("k", "v")
    val upd = Seq(("a", Option.empty[Double])).toDF("k", "v")
    val out = Mutations.mergeUpsert(base, upd, Seq("k")).collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(out.head.fieldIndex("v")),
      "WHEN MATCHED THEN UPDATE takes the update's value even when NULL — coalesce would silently keep the stale base value")
    assert(out.head.getString(out.head.fieldIndex("merge_action")) === "update")
  }

  test("mergeUpsert: output keys are exactly base ∪ updates, once each") {
    val base = Seq(("a", 1L), ("b", 1L)).toDF("k", "n")
    val upd = Seq(("b", 2L), ("c", 2L), ("d", 2L)).toDF("k", "n")
    val out = Mutations.mergeUpsert(base, upd, Seq("k"))
    assert(out.select("k").distinct().count() === 4)
    assert(out.count() === 4)
  }

  // ---- scd2 ----------------------------------------------------------------

  test("scd2: consecutive runs collapse; transitions open dated versions") {
    // user u: A A B A -> versions A[1,3) B[3,4) A[4,∞)
    val ev = Seq(
      (1L, "u", 1L, "A"), (2L, "u", 2L, "A"),
      (3L, "u", 3L, "B"), (4L, "u", 4L, "A")
    ).toDF("event_id", "user_id", "ts_us", "et")
    val out = Mutations.scd2(ev, "user_id", "et", "ts_us", "event_id")
      .orderBy("version")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out === Array(
      (1L, "A", 1L, 3L, false),
      (2L, "B", 3L, 4L, false),
      (3L, "A", 4L, -1L, true)))
  }

  test("scd2: single-version key is current from its first event") {
    val ev = Seq((1L, "u", 5L, "A"), (2L, "u", 9L, "A"))
      .toDF("event_id", "user_id", "ts_us", "et")
    val out = Mutations.scd2(ev, "user_id", "et", "ts_us", "event_id").collect()
    assert(out.length === 1)
    assert(out.head.getLong(3) === 5L) // valid_from = FIRST event of the run
    assert(out.head.getBoolean(5))
  }

  test("scd2: versions partition time — each event's ts lands in exactly one validity range") {
    val ev = Seq(
      (1L, "u", 1L, "A"), (2L, "u", 4L, "B"), (3L, "u", 7L, "B"),
      (4L, "u", 9L, "C"), (5L, "v", 2L, "X")
    ).toDF("event_id", "user_id", "ts_us", "et")
    val hist = Mutations.scd2(ev, "user_id", "et", "ts_us", "event_id")
      .select(col("user_id").as("h_uid"), col("et").as("h_et"),
        col("valid_from"), col("valid_to"))
    // point-in-time join: every source event matches exactly one version
    val matched = ev.join(hist,
      col("user_id") === col("h_uid") &&
        col("ts_us") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts_us") < col("valid_to")))
    assert(matched.count() === 5)
    // and the matched attribute agrees with the event's own
    assert(matched.filter(col("et") =!= col("h_et")).count() === 0)
  }

  // ---- invertedIndex / bigramPmi / normalizeText ---------------------------

  test("invertedIndex: sorted postings, df filter prunes hapax") {
    val docs = Seq(
      (3L, "x y"), (1L, "x z"), (2L, "x x y")
    ).toDF("doc_id", "text")
    val out = Text.invertedIndex(docs, minDf = 2)
      .orderBy("token")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // z appears in one doc -> pruned; x's repeat inside doc 2 counts once
    assert(out === Array(("x", 3L, "1,2,3"), ("y", 2L, "2,3")))
  }

  test("bigramPmi: phrase pair scores above an independent pair") {
    // "a b" always adjacent (phrase); "c" pairs spread across partners
    val docs = Seq(
      (1L, "a b c d a b"), (2L, "a b c e"), (3L, "a b d c")
    ).toDF("doc_id", "text")
    val out = Text.bigramPmi(docs, minCount = 1)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(out(("a", "b")) > out(("b", "c")),
      s"phrase (a,b) should out-score incidental (b,c): $out")
    // Church-Hanks by hand: c_ab=4, c_a.=4, c_.b=4, N=11 -> ln(4*11/16)
    assert(math.abs(out(("a", "b")) - math.log(4.0 * 11 / 16)) < 5e-4)
  }

  test("normalizeText: case folds, punctuation runs collapse, hash keys dedup") {
    val docs = Seq(
      (1L, "Hello,   World!!"), (2L, "hello world"), (3L, "HELLO--WORLD")
    ).toDF("doc_id", "text")
    val out = Text.normalizeText(docs).orderBy("doc_id").collect()
    val hashes = out.map(_.getString(3))
    assert(hashes.distinct.length === 1,
      "all three variants normalize to the same exact-dedup key")
    assert(out.map(_.getString(4)).forall(_ === "hello world"))
    assert(out.head.getLong(1) === 16L) // raw length preserved for audit
    assert(out.head.getLong(2) === 11L)
  }
}
