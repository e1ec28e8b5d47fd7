package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps
import graft.etl.Sinks

/** T3/S6 — first-write-wins dedup and idempotent upsert, the engine
  * form of `ON CONFLICT (user_id, event_timestamp, event_name) DO
  * NOTHING` (`/root/reference/flask_server.py:193`).
  */
class DedupUpsertSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    // (user, type, ts, payload)
    (1L, "click", 100L, "a"),
    (1L, "click", 50L, "b"),   // earlier ts → this one must be kept
    (1L, "click", 50L, "c"),   // same ts: payload 'b' wins via tiebreak? no — tiebreak col is ts itself
    (2L, "view", 10L, "d"),
    (3L, "click", 99L, "e")
  ).toDF("user_id", "event_type", "ts_us", "payload")

  test("dedupFirstWrite keeps the earliest row per key") {
    val out = EventOps
      .dedupFirstWrite(rows, Seq("user_id", "event_type"), "ts_us", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(out === Set(
      (1L, "click", 50L, "b"),
      (2L, "view", 10L, "d"),
      (3L, "click", 99L, "e")))
  }

  test("dedupFirstWrite is idempotent") {
    val once = EventOps.dedupFirstWrite(rows, Seq("user_id", "event_type"), "ts_us", "payload")
    val twice = EventOps.dedupFirstWrite(once, Seq("user_id", "event_type"), "ts_us", "payload")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("newKeysOnly drops rows whose key already exists") {
    val existing = Seq((1L, "click", 50L)).toDF("user_id", "event_type", "ts_us")
    val out = EventOps.newKeysOnly(rows, existing, Seq("user_id", "event_type", "ts_us"))
      .select("payload").as[String].collect().toSet
    assert(out === Set("a", "d", "e"))
  }

  test("upsertAppend is idempotent: re-applying the same batch inserts 0") {
    val dir = Files.createTempDirectory("graft-upsert").toString + "/sink"
    // In-batch dedup first (runOnce composes the same way); the sink
    // anti-join then guards across batches.
    val batch = EventOps
      .dedupFirstWrite(rows, Seq("user_id", "event_type", "ts_us"), "ts_us", "payload")
      .select("user_id", "event_type", "ts_us")
    val n1 = Sinks.upsertAppend(spark, batch, dir, Seq("user_id", "event_type", "ts_us"))
    val n2 = Sinks.upsertAppend(spark, batch, dir, Seq("user_id", "event_type", "ts_us"))
    assert(n1 === 4L) // 5 rows, one exact-key duplicate pair (1,click,50)
    assert(n2 === 0L)
    assert(spark.read.parquet(dir).count() === 4L)
  }
}
