package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Incremental

/** T1/T2 — the watermark pipeline: advances only forward and only on
  * success; incremental runs over a split stream equal one full run
  * (`/root/reference/flask_server.py:52-79,183-185,204-207`).
  */
class IncrementalSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-inc").toString

  private val keys = Seq("user_id", "event_type", "ts_us")

  private val stream = Seq(
    (1L, "click", 100L), (2L, "view", 200L), (1L, "click", 300L),
    (3L, "buy", 400L), (2L, "view", 500L), (1L, "view", 600L),
    // a late replay of an already-seen key (must be dropped by the sink)
    (1L, "click", 100L)
  ).toDF("user_id", "event_type", "ts_us")

  test("watermark file round-trips and defaults when absent") {
    val d = tmp()
    assert(Incremental.readWatermark(s"$d/wm.txt", 42L) === 42L)
    Incremental.writeWatermark(s"$d/wm.txt", 777L)
    assert(Incremental.readWatermark(s"$d/wm.txt", 42L) === 777L)
  }

  test("two incremental runs over a split equal one full run") {
    val base = tmp()
    // Full run in one shot.
    val fullState = s"$base/full_wm.txt"
    val fullSink = s"$base/full_sink"
    Incremental.runOnce(spark, stream, "ts_us", keys, fullState, fullSink, 0L)
    // Incremental: first the old half, then the whole stream again
    // (the second run sees only rows newer than the persisted watermark,
    // plus replays — which the keyed sink drops).
    val incState = s"$base/inc_wm.txt"
    val incSink = s"$base/inc_sink"
    val firstHalf = stream.filter($"ts_us" <= 300L)
    val r1 = Incremental.runOnce(spark, firstHalf, "ts_us", keys, incState, incSink, 0L).get
    assert(r1.newWatermarkUs === 300L)
    val r2 = Incremental.runOnce(spark, stream, "ts_us", keys, incState, incSink, 0L).get
    assert(r2.newWatermarkUs === 600L)

    val full = spark.read.parquet(fullSink).collect().map(_.toSeq).toSet
    val inc = spark.read.parquet(incSink).collect().map(_.toSeq).toSet
    assert(full === inc)
    assert(full.size === 6) // 7 input rows, 1 replay dropped
  }

  test("watermark does not move when there are no new rows") {
    val base = tmp()
    val state = s"$base/wm.txt"
    val sink = s"$base/sink"
    Incremental.runOnce(spark, stream, "ts_us", keys, state, sink, 0L)
    val r = Incremental.runOnce(spark, stream, "ts_us", keys, state, sink, 0L).get
    assert(r.rowsFetched === 0L)
    assert(r.rowsInserted === 0L)
    assert(r.newWatermarkUs === 600L)
    assert(Incremental.readWatermark(state, 0L) === 600L)
  }

  test("watermark is not advanced when the sink write fails") {
    val base = tmp()
    val state = s"$base/wm.txt"
    Incremental.writeWatermark(state, 250L)
    // A transform that blows up at execution time → the run fails
    // before any sink write, so the persisted watermark must not move.
    val boom = intercept[Exception] {
      Incremental.runOnce(
        spark, stream, "ts_us", keys, state, s"$base/sink", 0L,
        transform = df => df.filter(
          org.apache.spark.sql.functions.expr("assert_true(ts_us < 0)").isNull))
    }
    assert(Incremental.readWatermark(state, 0L) === 250L)
  }
}
