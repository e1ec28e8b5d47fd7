package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.streaming.StreamingCorpus

/** The streaming pHash candidate tier: images arriving as a stream
  * decode + hash map-side and their VERIFIED near-dup pairs (true
  * hamming at emission — the packed hashes ride the bucket state)
  * must equal the batch band self-join's pairs exactly, across
  * micro-batch splits that straddle planted groups.
  */
class StreamingMediaPhashSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val schema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bytes", BinaryType),
    StructField("ts_us", LongType)))

  test("streamed verified pairs ≡ batch phashNearDupPairs across " +
      "micro-batch splits") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-mphash").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = 1720000000000000L

    // the declared standing media fixture (planted same-base groups at
    // hamming 0/1/2, every 9th payload corrupt) fed in arrival order
    val feed = EntrySupport.phashMedia(spark, dir)
      .map(r => (r.media_id, r.bytes))
      .toDF("media_id", "bytes")
      .withColumn("ts_us", lit(t0) + col("media_id"))

    def run(): Unit = {
      val q = StreamingCorpus.phashCandidates(
          spark.readStream.schema(schema).parquet(src), "ts_us",
          hashBits = 64, bands = 4, maxHamming = 2)
        .writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // the split at 250 lands inside the base groups (64 bases over
    // 2000 ids), so most pairs must bridge the two waves through state
    feed.filter(col("media_id") < 250L)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    feed.filter(col("media_id") >= 250L)
      .coalesce(1).write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val batch = Multimodal.phashNearDupPairs(
        Multimodal.averageHash(EntrySupport.phashMedia(spark, dir),
          size = 8).toDF(),
        hashBits = 64, bands = 4, maxHamming = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(streamed.keySet === batch.keySet,
      "the streamed candidate tier must find exactly the batch's pairs")
    streamed.foreach { case (pair, ham) =>
      assert(ham === batch(pair), s"hamming of $pair")
    }
    assert(streamed.nonEmpty)
    // cross-wave pairs actually occurred (state carried the buckets)
    assert(streamed.keySet.exists { case (a, b) => a < 250L && b >= 250L },
      "some pair must bridge the micro-batch split through state")
  }
}
