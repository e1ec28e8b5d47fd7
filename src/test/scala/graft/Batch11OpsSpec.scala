package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Mutations}

/** Batch-11 operator fixtures: A/B two-proportion z-test, snapshot
  * CDC diff, seasonality profile, and JSON key profiling — pinned by
  * hand-computed examples including the degenerate-experiment,
  * NULL-comparison, and malformed-JSON edge cases.
  */
class Batch11OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- abTest --------------------------------------------------------------

  test("abTest: counts, rates, and the pooled z statistic") {
    // users 2,4 -> A (evens), 1,3 -> B; conversion = any 'buy'
    val ev = Seq(
      (2L, "buy"), (2L, "view"), (4L, "view"),
      (1L, "buy"), (3L, "buy"))
      .toDF("user_id", "event_type")
    val out = EventOps.abTest(ev, col("event_type") === "buy").collect().head
    assert(out.getLong(out.fieldIndex("n_a")) === 2L)
    assert(out.getLong(out.fieldIndex("n_b")) === 2L)
    assert(out.getLong(out.fieldIndex("conv_a")) === 1L)
    assert(out.getLong(out.fieldIndex("conv_b")) === 2L)
    assert(out.getDouble(out.fieldIndex("rate_a_r")) === 0.5)
    assert(out.getDouble(out.fieldIndex("rate_b_r")) === 1.0)
    // p_pool=0.75, z = (0.5-1.0)/sqrt(0.75*0.25*(1/2+1/2)) = -1.1547
    assert(out.getDouble(out.fieldIndex("z_r")) === -1.1547)
  }

  test("abTest: degenerate experiment (everyone converts) yields NULL z, no fault") {
    val ev = Seq((1L, "buy"), (2L, "buy")).toDF("user_id", "event_type")
    val out = EventOps.abTest(ev, col("event_type") === "buy").collect().head
    assert(out.isNullAt(out.fieldIndex("z_r")),
      "zero pooled variance has no defined z; ANSI division must not fault the job")
  }

  // ---- snapshotDiff ---------------------------------------------------------

  test("snapshotDiff: added/removed/changed/same classification") {
    val oldS = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "n")
    val newS = Seq(("b", 2L), ("c", 9L), ("d", 4L)).toDF("k", "n")
    val out = Mutations.snapshotDiff(oldS, newS, Seq("k"), Seq("n"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(r.fieldIndex("status"))))
    assert(out === Array(
      ("a", "removed"), ("b", "same"), ("c", "changed"), ("d", "added")))
  }

  test("snapshotDiff: NULL-to-NULL compares as same, NULL-to-value as changed") {
    val oldS = Seq(("a", Option.empty[Long]), ("b", Option.empty[Long]))
      .toDF("k", "n")
    val newS = Seq(("a", Option.empty[Long]), ("b", Some(1L))).toDF("k", "n")
    val out = Mutations.snapshotDiff(oldS, newS, Seq("k"), Seq("n"))
      .orderBy("k")
      .collect().map(r => r.getString(r.fieldIndex("status")))
    assert(out === Array("same", "changed"))
  }

  // ---- seasonality -----------------------------------------------------------

  test("seasonality: shares normalize within each day-of-week") {
    // 2024-01-14 is a Sunday (dow=1 in Spark), 01-15 Monday (dow=2)
    val us = (d: Int, h: Int) => (1704844800L + (d * 24 + h) * 3600L) * 1000000L
    val ev = Seq(
      us(4, 0), us(4, 0), us(4, 5), // Sunday: 2 at 00h, 1 at 05h
      us(5, 3)) // Monday: 1 at 03h
      .toDF("ts_us")
    val out = EventOps.seasonality(ev, "ts_us").orderBy("dow", "hod")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(
      (1L, 0L, 2L, 0.6667), (1L, 5L, 1L, 0.3333), (2L, 3L, 1L, 1.0)))
  }

  // ---- jsonKeyProfile --------------------------------------------------------

  test("jsonKeyProfile: key frequency, distinct values, malformed rows drop") {
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2}""",
      """{"a": 1}""",
      "not json at all")
      .toDF("raw")
    val out = EventOps.jsonKeyProfile(df, "raw").orderBy("key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // share denominators count ALL rows (4), malformed included
    assert(out === Array(("a", 3L, 2L, 0.75), ("b", 1L, 1L, 0.25)))
  }
}
