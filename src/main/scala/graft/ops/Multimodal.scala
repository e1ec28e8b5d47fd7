package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so a real codec would be
  * loaded once per executor task, not once per row.
  *
  * No media codec ships in this environment, so [[StubCodec]] is a
  * clearly-marked DETERMINISTIC FAKE — it fabricates "features" from
  * byte statistics. The Spark-side plumbing (schema, partitioning,
  * batch shape, per-partition decoder lifecycle) is real and tested;
  * swapping in a true decoder touches only `StubCodec.decode`.
  */
object Multimodal {

  /** An opaque media payload with typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,              // "image" | "audio" | "video"
      bytes: Array[Byte],
      n_bytes: Long,
      format: String)

  /** Per-item features from the (stub) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_frames: Int,
      features: Array[Double])

  /** STUB — stands in for an image/audio/video codec. Deterministic:
    * derives pseudo-features from byte content so tests can pin exact
    * values. A production build replaces this object with JNI/FFI codec
    * bindings; everything else is unchanged.
    */
  object StubCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val frames = row.kind match {
        case "video" => 8
        case "audio" => 4
        case _ => 1
      }
      // fake per-frame "feature": mean byte value of each frame slice
      val n = row.bytes.length.max(1)
      val feats = (0 until frames).map { f =>
        val from = f * n / frames
        val until = ((f + 1) * n / frames).max(from + 1).min(n)
        val slice = row.bytes.slice(from, until)
        if (slice.isEmpty) 0.0
        else slice.map(b => (b & 0xff).toDouble).sum / slice.length
      }.toArray
      MediaFeatures(row.media_id, row.kind, frames, feats)
    }
  }

  /** Manufacture a media table from `documents` (the harness testdata
    * has no binary table): text bytes as payload, kind round-robin by
    * id. This is the ingest-side schema any real media source would
    * produce.
    */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      expr("element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1)").as("kind"),
      col("text").cast("binary").as("bytes"),
      expr("octet_length(cast(text as binary))").cast("long").as("n_bytes"),
      lit("utf8-fake").as("format")).as[MediaRow]
  }

  /** Per-partition decode: the codec is "opened" once per partition
    * (the expensive part for a real codec), then streamed over rows.
    * At scale, partition sizing (`maxPartitionBytes`) bounds decoder
    * memory; rows never collect to the driver.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real codec: open native handles here, close in a TaskCompletionListener
      rows.map(StubCodec.decode)
    }
  }
}
