package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus
import graft.streaming.StreamingCorpus

/** The streaming end-to-end crawl capstone: two chained append-mode
  * flatMapGroupsWithState stages (canonical race → text-hash race)
  * probing the materialized standing indexes must assign the SAME
  * per-doc stage verdicts as the batch increment
  * ([[graft.ops.Corpus.webCorpusIncrementFrom]]) when pages arrive in
  * doc order — across micro-batch splits that straddle both an
  * in-batch canonical group and the in-batch same-text pair, so both
  * states are proven to persist across batch boundaries.
  */
class WebCorpusStreamSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("html", StringType),
    StructField("ts_us", LongType)))

  test("streamed capstone verdicts ≡ batch increment verdicts across " +
      "micro-batch splits") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-wc-stream").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = 1700000000000000L

    // the SAME standing indexes and planted batch as the declared
    // store-fed query (one definition — EntrySupport)
    val (canonIdx, textIdx) = EntrySupport.wcIndexes(spark, dir)
    import spark.implicits._
    // the declared store-fed batch, plus three hazard pages so every
    // verdict class flows through the streaming junction too
    val batch = EntrySupport.wcBatchPages(spark, dir, copyMod = 3, freshMod = 0)
      .unionByName(Seq(
        (7500000L, "<html><head><title>h1</title></head><body>" +
          "<script>var broken = [<p>x</p></body></html>"),
        (7500001L, "<html><head><title>h2</title>" +
          "<meta name=\"robots\" content=\"noindex\"></head><body>" +
          "<script>t()</script><p>some fine prose here</p></body></html>"),
        (7500002L, "<html><head><title>h3</title></head><body>" +
          "<script>t()</script><p>tiny words</p></body></html>"))
        .toDF("doc_id", "html"))
    val feed = batch.withColumn("ts_us", lit(t0) + col("doc_id"))

    def run(): Unit = {
      val q = StreamingCorpus.webCorpusStream(
          spark.readStream.schema(schema).parquet(src), "ts_us",
          canonIdx, textIdx)
        .writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // three arrival waves: the split at 5.5M lands inside the
    // impersonating-copy range (canonical groups straddle), and the
    // split between 7000000 and 7000001 forces the in-batch same-text
    // pair's keeper slot to survive in state across runs
    feed.filter(col("doc_id") < 5500000L)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    feed.filter(col("doc_id") >= 5500000L && col("doc_id") <= 7000000L)
      .coalesce(1).write.mode("append").parquet(src)
    run()
    feed.filter(col("doc_id") > 7000000L)
      .coalesce(1).write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("stage"), Option(r.getAs[Any]("tok_cnt")))).toMap

    val batchRef = Corpus.webCorpusIncrementFrom(canonIdx, textIdx, batch)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("stage"), Option(r.getAs[Any]("tok_cnt")))).toMap

    assert(streamed.size === batchRef.size)
    assert(streamed === batchRef)
    // every verdict class the law covers actually occurred, including
    // the two cross-batch races
    val stages = batchRef.values.map(_._1).toSet
    assert(Set("canonical_dup", "text_dup", "kept", "noindex",
      "quarantined", "low_quality").subsetOf(stages), s"got $stages")
    assert(streamed(7000001L)._1 === "text_dup",
      "the pair's second member arrived in a LATER micro-batch and must " +
        "still lose the text race to the stored keeper slot")
  }
}
