package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAggregates

/** Pins the streaming DSIR histogram
  * (streaming/StreamingAggregates.dsirHistogram) to the batch scorer:
  * the windowed sink rows FOLD across windows by adding counts
  * (histogram mergeability), and weights served from the merged ratio
  * table — the exact micro-nat arithmetic of Text.dsirWeights,
  * replicated driver-side — must equal the batch operator's output
  * row-for-row on the same documents.
  */
class StreamingDsirSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("streamed histograms fold to the batch scorer's exact weights") {
    val base = Files.createTempDirectory("graft-sdsir").toString
    val h = 3600L * 1000000
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("ts_us", LongType)))
    // docs spread across TWO tumbling windows so the parity claim
    // exercises the merge, not just a single window's aggregate;
    // far-future tick finalizes both
    val docs = (0 until 60).map { i =>
      val lang = if (i % 3 == 0) "en" else "xx"
      val text =
        if (lang == "en") s"alpha beta tok$i common end"
        else s"gamma delta tok$i common end"
      (i.toLong, lang, text, (i / 30) * h + (i + 1L) * 1000000)
    }
    (docs :+ ((999L, "xx", null: String, 100 * h)))
      .toDF("doc_id", "lang", "text", "ts_us")
      .coalesce(1).write.parquet(s"$base/src")

    val buckets = 256
    StreamingAggregates.dsirHistogram(
      spark, s"$base/src", schema, "ts_us", "text", col("lang") === "en",
      s"$base/ckpt", s"$base/sink", buckets = buckets).awaitTermination()

    // fold the windowed sink: histogram union = per-bucket count sums
    val sink = spark.read.parquet(s"$base/sink").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sink.map(_._1).distinct.length <= buckets)
    val hist = sink.groupBy(_._1).map { case (b, rs) =>
      b -> ((rs.map(_._2).sum, rs.map(_._3).sum))
    }
    val sTot = hist.values.map(_._1).sum
    val tTot = hist.values.map(_._2).sum

    // serve weights locally with the batch operator's exact math:
    // md5-prefix bucket, micro-nat quantized log ratio, long sum
    def halfUp0(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    def bucketOf(gram: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(gram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    def loglrU6(b: Long): Long = {
      val (sc, tc) = hist.getOrElse(b, (0L, 0L))
      halfUp0((math.log((tc + 1).toDouble / (tTot + buckets)) -
        math.log((sc + 1).toDouble / (sTot + buckets))) * 1e6)
    }
    val served = docs.map { case (id, lang, text, _) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val grams = toks.toSeq ++ toks.toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" "))
      val u6 = grams.map(g => loglrU6(bucketOf(g))).sum
      (id, lang, grams.size.toLong, u6 / 1e6)
    }.sortBy(_._1)

    val batch = graft.ops.Text.dsirWeights(
        docs.toDF("doc_id", "lang", "text", "ts_us"),
        col("lang") === "en", buckets)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(served === batch,
      "weights served from the streamed histograms diverged from the batch scorer")
  }
}
