package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus
import graft.streaming.StreamingCorpus

/** Streaming canonical keeper: per-page verdicts with bounded
  * per-canonical first-seen state, equal to the batch q_crawl_pipeline
  * keeper window when arrivals are fed in doc order.
  */
class StreamingCrawlKeeperSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("html", StringType),
    StructField("ts_us", LongType)))

  // the q_crawl_pipeline page construction (hazards + head metadata)
  private def pagesFor(docs: org.apache.spark.sql.DataFrame) = docs
    .select(col("doc_id"), concat(
      lit("<html><head><title>doc "), col("doc_id").cast("string"),
      lit("</title>"),
      when(col("doc_id") % 5 === 0,
        lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit("<link rel=\"canonical\" href=\"https://example.com/c/"),
          expr("doc_id div 9").cast("string"), lit("\">")))
        .otherwise(lit("")),
      lit("</head><body>"),
      when(col("doc_id") % 13 === 0, lit("<script>var broken = trackers["))
        .otherwise(lit("<script>track();</script>")),
      lit("<p>R&amp;D says x &lt; y</p><p>"), col("text"),
      lit("</p></body></html>")).as("html"))

  test("streamed keeper verdicts ≡ batch keeper window, incl. cross-batch " +
      "canonical reuse") {
    val base = Files.createTempDirectory("graft-crawl-keeper").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val t0 = System.currentTimeMillis() * 1000L

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(90).select(col("doc_id"), col("text"))
    val pages = pagesFor(docs)
    val feed = pages.withColumn("ts_us", lit(t0) + col("doc_id"))

    def run(): Unit = {
      val q = StreamingCorpus.canonicalFirstSeen(
          spark.readStream.schema(schema).parquet(src), "ts_us")
        .writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // two batches SPLITTING canonical groups across the boundary (ids
    // 0..44 then 45..: group doc_id div 9 = 4 has members 36..44 on
    // both sides) — the keeper slot must persist in state
    feed.filter(col("doc_id") < 42).coalesce(1).write.mode("append").parquet(src)
    run()
    feed.filter(col("doc_id") >= 42).coalesce(1).write.mode("append").parquet(src)
    run()

    val streamed = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("verdict"),
          r.getAs[Long]("kept"))).toMap

    // batch reference: the declared query's synthetic-key window
    import org.apache.spark.sql.expressions.Window
    val g = Corpus.crawlGate(pages)
      .withColumn("passes",
        (col("status") === "ok" && col("verdict") === "index").cast("long"))
    val pkey = when(col("passes") === 1L && col("canonical").isNotNull,
        concat(lit("c:"), col("canonical")))
      .otherwise(concat(lit("d:"), col("doc_id").cast("string")))
    val batch = g
      .withColumn("rn",
        row_number().over(Window.partitionBy(pkey).orderBy(col("doc_id"))))
      .select(col("doc_id"), col("status"), col("verdict"),
        when(col("passes") === 0L, lit(0L))
          .when(col("rn") === 1, lit(1L)).otherwise(lit(0L)).as("kept"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("verdict"),
          r.getAs[Long]("kept"))).toMap

    assert(streamed.size === batch.size)
    assert(streamed === batch)
    // the planted hazards actually appeared
    assert(batch.values.exists(_._1 == "quarantined"))
    assert(batch.values.exists(_._2 == "drop"))
    assert(batch.count(_._2._3 == 0L) > 0 && batch.count(_._2._3 == 1L) > 0)
  }
}
