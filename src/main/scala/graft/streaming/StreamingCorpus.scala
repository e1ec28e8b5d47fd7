package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.Sinks
import graft.ops.Corpus

/** Continuous training-corpus intake — the streaming twin of
  * [[graft.ops.Corpus.buildCorpus]]'s front half: documents arrive as
  * files, exact content duplicates are dropped within the lateness
  * horizon (BOUNDED state: content-hash keys expire with the
  * watermark), the Gopher quality gate rides map-side on each
  * micro-batch, and the keyed idempotent sink absorbs re-deliveries —
  * so arbitrarily-late replays of the same content never land twice.
  *
  * At 100 TB this is the shape that matters: dedup state is
  * hash-per-recent-doc (not the corpus), the gate adds zero shuffles,
  * and the sink anti-join prunes to the batch's key set. Downstream
  * (shuffle-shard, packing) runs as a periodic batch job over the
  * sink — packing is corpus-order-dependent, so it belongs in the
  * batch half, not per micro-batch.
  */
object StreamingCorpus {

  /** Drain-available run. `schema` must contain `doc_id`, `text`, and
    * `tsMicrosCol` (ingest time, epoch micros).
    */
  def start(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      tsMicrosCol: String,
      checkpointDir: String,
      sinkDir: String,
      lateness: String = "1 hour"): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .withColumn("text_hash", md5(col("text").cast("binary")))
      .withColumn("__event_time", timestamp_micros(col(tsMicrosCol)))
      .withWatermark("__event_time", lateness)
      .dropDuplicatesWithinWatermark("text_hash")
    Corpus.gopherPass(src)
      .drop("__event_time")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sinks.upsertAppend(batch.sparkSession, batch, sinkDir, Seq("text_hash"))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
