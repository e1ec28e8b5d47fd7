package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** Funnel fold semantics on hand-walked fixtures: strict ordering
  * between steps, same-timestamp exclusion, out-of-order arrivals,
  * and partial progressions.
  */
class FunnelSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val steps = Seq("click", "view", "purchase")

  private def run(rows: Seq[(Long, Long, String)]) =
    EventOps.funnelStages(
      rows.toDF("user_id", "ts_us", "event_type"), "ts_us", "event_type", steps)
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getLong(4))))
      .toMap

  test("full, partial, and empty progressions") {
    val out = run(Seq(
      // user 1: complete funnel, with noise and a later better path
      (1L, 10L, "click"), (1L, 15L, "error"), (1L, 20L, "view"),
      (1L, 30L, "purchase"), (1L, 5L, "view"), // early view ignored (before click)
      // user 2: view before any click → stuck at stage 1 after late click
      (2L, 10L, "view"), (2L, 20L, "click"),
      // user 3: no funnel events at all
      (3L, 10L, "error")))
    assert(out(1L) === ((10L, 20L, 30L, 3L)))
    assert(out(2L) === ((20L, -1L, -1L, 1L)))
    assert(out(3L) === ((-1L, -1L, -1L, 0L)))
  }

  test("equal timestamps never advance a stage (strictly-after contract)") {
    val out = run(Seq(
      (1L, 10L, "click"), (1L, 10L, "view"), (1L, 11L, "purchase")))
    // the view at ts=10 is NOT after the click at ts=10 → stage 2 never
    // reached, and the purchase can't skip it
    assert(out(1L) === ((10L, -1L, -1L, 1L)))
  }

  test("earliest eligible timestamp wins per step") {
    val out = run(Seq(
      (1L, 30L, "view"), (1L, 10L, "click"), (1L, 20L, "view"), (1L, 5L, "click")))
    assert(out(1L) === ((5L, 20L, -1L, 2L)))
  }
}
