package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** FIXTURES.md §2 — the reference's parity pipeline end-to-end on the
  * GA4 micro-fixture: filter (null/empty user, tracked vocabulary) →
  * N1 extraction → natural-key first-write dedup. Expected output is
  * pinned row by row.
  */
class Ga4PipelineSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val vocabulary = Seq(
    "select_menu_category", "open_item_details", "select_commerce_category",
    "select_vendor", "add_item_to_favorites", "view_item")

  private val paramType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(StructField("string_value", StringType)))))))

  private val schema = StructType(Seq(
    StructField("arrival", LongType),
    StructField("user_id", StringType),
    StructField("event_date", StringType),
    StructField("event_timestamp", LongType),
    StructField("event_name", StringType),
    StructField("event_params", paramType)))

  private def p(k: String, v: String): Row = Row(k, Row(v))

  private val fixture = Seq(
    Row(0L, "u1", "2026-01-01", 1735689600000001L, "view_item",
      Seq(p("id", "item-42"), p("name", "Blue Widget"))),
    Row(1L, "u2", "2026-01-01", 1735689600000002L, "select_vendor",
      Seq(p("id", "v-7"))),
    Row(2L, "u3", "2026-01-01", 1735689600000003L, "view_item",
      Seq(p("id", "first"), p("id", "second"))),
    Row(3L, "u4", "2026-01-01", 1735689600000004L, "open_item_details", null),
    Row(4L, "u5", "2026-01-01", 1735689600000005L, "open_item_details", Seq.empty[Row]),
    // same natural key as arrival 0 — first write must win
    Row(5L, "u1", "2026-01-01", 1735689600000001L, "view_item",
      Seq(p("id", "DUPE"), p("name", "DUPE"))),
    Row(6L, null, "2026-01-01", 1735689600000006L, "view_item", Seq.empty[Row]),
    Row(7L, "", "2026-01-01", 1735689600000007L, "view_item", Seq.empty[Row]),
    Row(8L, "u6", "2026-01-01", 1735689600000008L, "untracked_event", Seq.empty[Row]))

  private lazy val out = EventOps.ga4Pipeline(
    spark.createDataFrame(spark.sparkContext.parallelize(fixture), schema),
    vocabulary, arrivalCol = "arrival")
    .collect()
    .map(r => r.getAs[String]("user_id") ->
      ((Option(r.getAs[String]("event_id")), Option(r.getAs[String]("event_name_detail")))))
    .toMap

  test("exactly u1..u5 survive the filters and dedup") {
    assert(out.keySet === Set("u1", "u2", "u3", "u4", "u5"))
  }

  test("happy path extracts both params") {
    assert(out("u1") === ((Some("item-42"), Some("Blue Widget"))))
  }

  test("missing name param yields NULL detail") {
    assert(out("u2") === ((Some("v-7"), None)))
  }

  test("duplicate id keys: last match wins") {
    assert(out("u3") === ((Some("second"), None)))
  }

  test("null and empty params arrays yield NULL, NULL") {
    assert(out("u4") === ((None, None)))
    assert(out("u5") === ((None, None)))
  }

  test("first write wins on natural-key collision (not the DUPE row)") {
    assert(out("u1")._1 === Some("item-42"))
  }
}
