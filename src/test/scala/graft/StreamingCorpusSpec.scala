package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCorpus

/** Streaming corpus intake: content dedup within the watermark,
  * quality gate per micro-batch, and idempotent sink behavior across
  * resumed and replayed runs.
  */
class StreamingCorpusSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts_us", LongType)))

  private def goodText(tag: String): String =
    (1 to 15).map(i => s"${tag}word$i").mkString(" ") // 15 words: passes the gate

  test("dedups content, gates quality, and absorbs replays") {
    val base = Files.createTempDirectory("graft-scorpus").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    Seq(
      (1L, goodText("a"), t0 + 1),
      (2L, goodText("a"), t0 + 2),   // same CONTENT, different id → dropped
      (3L, "too short", t0 + 3),     // fails the Gopher gate (< 10 words)
      (4L, goodText("b"), t0 + 4)
    ).toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    StreamingCorpus.start(spark, src, schema, "ts_us", ckpt, sink).awaitTermination()
    val after1 = spark.read.parquet(sink).collect()
    assert(after1.length === 2) // one per distinct quality content
    assert(after1.map(_.getAs[String]("text")).toSet ===
      Set(goodText("a"), goodText("b")))

    // second drop: a replay of content 'b' (new id, late) + new content
    Seq(
      (5L, goodText("b"), t0 + 10),  // replayed content → sink skips
      (6L, goodText("c"), t0 + 11)
    ).toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    StreamingCorpus.start(spark, src, schema, "ts_us", ckpt, sink).awaitTermination()
    val after2 = spark.read.parquet(sink).collect()
    assert(after2.length === 3)

    // checkpoint loss: full source replay, idempotent sink absorbs all
    StreamingCorpus.start(spark, src, schema, "ts_us", s"$base/ckpt2", sink)
      .awaitTermination()
    assert(spark.read.parquet(sink).collect().length === 3)
  }
}
