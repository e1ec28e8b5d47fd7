package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TypedOps

/** The typed Dataset tier: encoder round trip (incl. None keys),
  * typed-aggregator results equal to the untyped relational plan, and
  * the mapGroups imperative op on a hand-computed fixture.
  */
class TypedOpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(1L), 10L, "click", 1.0),
    (2L, Some(1L), 20L, "click", 2.0),
    (3L, Some(1L), 30L, "view", 4.0),
    (4L, Some(1L), 40L, "click", 8.0),
    (5L, Some(2L), 10L, "view", 16.0),
    (6L, None, 10L, "click", 32.0),
    (7L, None, 20L, "click", 64.0)
  ).toDF("event_id", "user_id", "ts_us", "event_type", "value")

  test("asEvents round-trips rows, None for null user_id") {
    val evs = TypedOps.asEvents(fixture).collect()
    assert(evs.length === 7)
    assert(evs.filter(_.user_id.isEmpty).map(_.event_id).sorted.toSeq === Seq(6L, 7L))
    assert(evs.find(_.event_id == 5L).get.value === 16.0)
  }

  test("typed aggregator equals the untyped relational aggregate") {
    val typed = TypedOps.perUserTotals(TypedOps.asEvents(fixture))
      .collect().map { case (k, n, total) => (k, n, total) }.toSet
    val untyped = fixture.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(typed === untyped)
    assert(typed.contains((None, 2L, 96.0)))
  }

  test("typed column filter equals typed lambda filter") {
    val ds = TypedOps.asEvents(fixture)
    val viaColumn = TypedOps.ofType(ds, "click").collect().map(_.event_id).toSet
    val viaLambda = ds.filter(_.event_type == "click").collect().map(_.event_id).toSet
    assert(viaColumn === viaLambda)
    assert(viaColumn === Set(1L, 2L, 4L, 6L, 7L))
  }

  test("longestRunPerUser: per-group imperative logic on objects") {
    // user 1: click,click,view,click → longest run 2; user 2: 1; None: 2
    val runs = TypedOps.longestRunPerUser(TypedOps.asEvents(fixture))
      .collect().toMap
    assert(runs === Map(Some(1L) -> 2, Some(2L) -> 1, None -> 2))
  }
}
