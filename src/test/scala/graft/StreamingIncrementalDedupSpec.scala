package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingCorpus

/** Streaming incremental dedup: per-doc verdicts against a standing
  * corpus index + the stream's own horizon, equal to the batch
  * operator's verdicts when the same docs arrive as one batch.
  */
class StreamingIncrementalDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts_us", LongType)))

  test("verdicts: corpus dup, same-batch dup, cross-batch dup, fresh keep") {
    val base = Files.createTempDirectory("graft-sinc").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    val corpus = Seq((100L, "standing alpha"), (101L, "standing beta"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.corpusHashIndex(corpus)

    def run(): Unit = {
      val q = StreamingCorpus.incrementalDedup(
          spark.readStream.schema(schema).parquet(src), idx, "ts_us")
        .writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // micro-batch 1: corpus dup, fresh, fresh + its same-batch dup
    Seq(
      (1L, "standing alpha", t0 + 1),
      (2L, "fresh one", t0 + 2),
      (3L, "fresh two", t0 + 3),
      (4L, "fresh two", t0 + 4)
    ).toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    run()
    // micro-batch 2: cross-batch dup of "fresh one" + genuinely new
    Seq(
      (5L, "fresh one", t0 + 10),
      (6L, "fresh three", t0 + 11)
    ).toDF("doc_id", "text", "ts_us").coalesce(1).write.mode("append").parquet(src)
    run()

    val got = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_of_corpus"), r.getAs[Long]("dup_in_stream"),
          r.getAs[Long]("keep")))).toMap
    assert(got(1L) === ((1L, 0L, 0L)), "corpus dup")
    assert(got(2L) === ((0L, 0L, 1L)), "fresh keep")
    assert(got(3L) === ((0L, 0L, 1L)), "first of in-batch pair keeps")
    assert(got(4L) === ((0L, 1L, 0L)), "same-batch dup flagged")
    assert(got(5L) === ((0L, 1L, 0L)), "cross-batch dup flagged via state")
    assert(got(6L) === ((0L, 0L, 1L)), "new content in batch 2 keeps")
    assert(got.size === 6, "every arriving doc gets a verdict row")
  }

  test("one-shot stream equals the batch operator verdict-for-verdict") {
    val base = Files.createTempDirectory("graft-sinc-eq").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // batch under test: 30 copies of corpus docs (re-keyed), 20 fresh
    // docs with 10 internal dup pairs — arrival order = doc_id order
    val batch = corpus.limit(30)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      .unionByName(spark.range(20).select(
        (col("id") + 200000L).as("doc_id"),
        concat(lit("fresh text "), (col("id") % 10L).cast("string")).as("text")))
      .withColumn("ts_us", lit(t0) + col("doc_id"))
    batch.coalesce(1).write.mode("append").parquet(src)

    val q = StreamingCorpus.incrementalDedup(
        spark.readStream.schema(schema).parquet(src),
        graft.ops.Dedup.corpusHashIndex(corpus), "ts_us")
      .writeStream
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(sink)
      .select("doc_id", "dup_of_corpus", "dup_in_stream", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batched = graft.ops.Dedup.incrementalNewDocs(corpus, batch)
      .select(col("doc_id"), col("dup_of_corpus"),
        col("dup_in_batch"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty && streamed === batched)
  }
}
