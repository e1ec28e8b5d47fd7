package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** As-of join semantics on a hand-built fixture (equal-ts inclusion,
  * tie-break, no-match nulls, key isolation) and the binned range
  * join's equivalence with the naive inequality join.
  */
class AsofRangeJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left row") {
    // right: user 1 has purchases at ts 10, 20, 20 (ids 101, 102, 103 —
    // two tie on ts=20); user 2 has one at ts 50; user 3 has none.
    val right = Seq(
      (1L, 10L, 101L), (1L, 20L, 102L), (1L, 20L, 103L), (2L, 50L, 201L)
    ).toDF("user_id", "ts_us", "event_id")
    // left: clicks at ts 5 (before everything), 20 (exactly at the tie),
    // 30 (after), and user-3 click (no right rows at all)
    val left = Seq(
      (1L, 1L, 5L), (2L, 1L, 20L), (3L, 1L, 30L), (4L, 2L, 40L),
      (5L, 2L, 50L), (6L, 3L, 99L)
    ).toDF("event_id", "user_id", "ts_us")

    val out = Relational
      .asofJoin(left, right, "user_id", "ts_us", "event_id", Seq("ts_us", "event_id"))
      .select($"event_id", $"asof.ts_us".as("p_ts"), $"asof.event_id".as("p_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet

    assert(out === Set(
      (1L, null, null),   // ts 5: nothing at or before
      (2L, 20L, 103L),    // equal ts included; tie broken by max event_id
      (3L, 20L, 103L),    // later click: same winner
      (4L, null, null),   // user 2 before their purchase
      (5L, 50L, 201L),    // exactly at the purchase
      (6L, null, null)))  // user with no right rows
  }

  test("asofJoin never crosses keys") {
    val right = Seq((1L, 10L, 900L)).toDF("user_id", "ts_us", "event_id")
    val left = Seq((1L, 2L, 100L)).toDF("event_id", "user_id", "ts_us")
    val out = Relational
      .asofJoin(left, right, "user_id", "ts_us", "event_id", Seq("event_id"))
    assert(out.filter($"asof".isNotNull).count() === 0)
  }

  test("binned range join equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    // spans negative values: bin assignment must FLOOR, not truncate
    val facts = (0 until 400).map(i => (i.toLong, rnd.nextInt(1000).toLong - 500L))
      .toDF("fact_id", "ts")
    val ivs = (0 until 30).map { i =>
      val lo = rnd.nextInt(900).toLong - 450L
      (i.toLong, lo, lo + 1 + rnd.nextInt(150).toLong)
    }.toDF("iv_id", "lo", "hi")

    val naive = facts.crossJoin(ivs)
      .filter($"ts" >= $"lo" && $"ts" < $"hi")
      .select("fact_id", "iv_id").collect().map(_.toSeq).toSet
    // bin width deliberately NOT matched to interval length — correctness
    // must not depend on the tuning knob
    for (width <- Seq(32L, 100L, 1000L)) {
      val binned = Relational.rangeJoinBinned(facts, "ts", ivs, "lo", "hi", width)
        .select("fact_id", "iv_id").collect().map(_.toSeq).toSet
      assert(binned === naive, s"binWidth=$width")
    }
    assert(naive.nonEmpty)
  }
}
