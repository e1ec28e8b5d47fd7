package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCorpus

/** Streaming segment first-seen dedup: per-occurrence dup flags with
  * bounded per-segment state, equal to the batch segmentDedup counts
  * when arrivals are fed in doc order.
  */
class StreamingSegmentDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts_us", LongType)))

  test("cross-batch segment reuse flags dup; fresh segments pass") {
    val base = Files.createTempDirectory("graft-sseg").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    def run(): Unit = {
      val q = StreamingCorpus.segmentFirstSeen(
          spark.readStream.schema(schema).parquet(src), "ts_us", w = 2)
        .writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: doc 1 owns [a b][c d]; doc 2 repeats [a b], owns [x y]
    Seq(
      (1L, "a b c d", t0 + 1),
      (2L, "a b x y", t0 + 2)
    ).toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    run()
    // batch 2: doc 3 repeats both of doc 1's segments ACROSS batches
    Seq((3L, "a b c d", t0 + 10))
      .toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(sink).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("seg")) -> r.getAs[Long]("dup"))
      .toMap
    assert(got((1L, "a b")) === 0L && got((1L, "c d")) === 0L)
    assert(got((2L, "a b")) === 1L, "in-horizon segment reuse flagged")
    assert(got((2L, "x y")) === 0L)
    assert(got((3L, "a b")) === 1L && got((3L, "c d")) === 1L,
      "cross-batch reuse flagged via state")
    assert(got.size === 6)
  }

  test("one-shot stream equals batch segmentDedup counts per doc") {
    val base = Files.createTempDirectory("graft-sseg-eq").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(80)
      .select(col("doc_id"), col("text"))
    val feed = docs.unionByName(
        docs.limit(20).select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .withColumn("ts_us", lit(t0) + col("doc_id")) // arrival order = doc order
    feed.coalesce(1).write.mode("append").parquet(src)

    val q = StreamingCorpus.segmentFirstSeen(
        spark.readStream.schema(schema).parquet(src), "ts_us", w = 8)
      .writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(sink)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"), sum(col("dup")).as("n_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batched = graft.ops.Dedup.segmentDedup(feed.select("doc_id", "text"), w = 8)
      .select("doc_id", "n_segs", "n_dup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed === batched)
  }
}
