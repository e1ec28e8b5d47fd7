package graft.etl

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.EventOps

/** The incremental watermark pipeline (SURVEY.md §2.10, §7.3) — the
  * batch-faithful form of the reference's `run_etl`
  * (`/root/reference/flask_server.py:82-229`):
  *
  *   read watermark → filter strictly-newer → transform → in-batch
  *   dedup → anti-join vs sink → append → advance watermark ONLY after
  *   the sink write succeeded, ONLY forward
  *   (`/root/reference/flask_server.py:183-185,204-207`).
  *
  * At-least-once delivery + the idempotent keyed sink = effectively-once,
  * exactly the reference's guarantee (`/root/reference/README.md:147-148`).
  *
  * The scale form of the same pipeline is Structured Streaming
  * (`readStream` → `dropDuplicatesWithinWatermark` → `foreachBatch`
  * upsert with `Trigger.AvailableNow()`), where the checkpoint dir
  * replaces this file-based scalar; the batch form is kept because it
  * is the faithful port and is what the oracle can check.
  */
object Incremental {

  /** Reference: `read_last_timestamp` (`/root/reference/flask_server.py:52-68`) —
    * persisted text scalar, else `now - lookback`.
    */
  def readWatermark(statePath: String, defaultUs: Long): Long = {
    val p = Paths.get(statePath)
    if (Files.exists(p)) Files.readString(p).trim.toLong else defaultUs
  }

  /** Reference: `write_last_timestamp` (`/root/reference/flask_server.py:71-79`).
    * Atomic move so a crash mid-write can't corrupt the checkpoint.
    */
  def writeWatermark(statePath: String, wmUs: Long): Unit = {
    val p = Paths.get(statePath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(statePath + ".tmp")
    Files.writeString(tmp, wmUs.toString)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Single-flight guard (`/root/reference/flask_server.py:86-90`) — the
    * reference's check-then-set on a shared dict is racy; an
    * AtomicBoolean is the correct form.
    */
  private val running = new AtomicBoolean(false)

  final case class RunResult(rowsFetched: Long, rowsInserted: Long, newWatermarkUs: Long)

  /** One incremental run. `transform` is the pluggable extraction step
    * (N1 etc.); `keys` is the natural dedup key. Returns None if another
    * run is in flight (HTTP 409 analogue,
    * `/root/reference/flask_server.py:270-271`).
    */
  def runOnce(
      spark: SparkSession,
      source: DataFrame,
      tsCol: String,
      keys: Seq[String],
      statePath: String,
      sinkDir: String,
      defaultWatermarkUs: Long,
      transform: DataFrame => DataFrame = identity): Option[RunResult] =
    runOnceTo(spark, source, tsCol, keys, statePath, defaultWatermarkUs,
      batch => Sinks.upsertAppend(spark, batch, sinkDir, keys), transform)

  /** [[runOnce]] with a pluggable idempotent sink — the same watermark
    * / dedup / advance-after-commit protocol feeding any conflict-skip
    * writer: the parquet upsertAppend (default above), a live-Postgres
    * [[Sinks.copyUpsertPostgres]] (the reference's actual target,
    * exercised in PostgresDialectSpec), or a test double. The sink
    * returns rows actually inserted (cursor.rowcount semantics).
    */
  def runOnceTo(
      spark: SparkSession,
      source: DataFrame,
      tsCol: String,
      keys: Seq[String],
      statePath: String,
      defaultWatermarkUs: Long,
      sink: DataFrame => Long,
      transform: DataFrame => DataFrame = identity): Option[RunResult] = {
    if (!running.compareAndSet(false, true)) return None
    try {
      val wm = readWatermark(statePath, defaultWatermarkUs)
      val fresh = transform(source.filter(col(tsCol) > lit(wm)))
      val batch = EventOps
        .dedupFirstWrite(fresh, keys, tsCol, keys.head)
        .cache()
      val fetched = batch.count()
      val inserted = sink(batch)
      // Advance only forward, only after the sink write committed —
      // mirrors flask_server.py:204-207 ordering.
      val maxRow = batch.agg(max(col(tsCol))).head()
      batch.unpersist()
      val newWm = if (fetched == 0 || maxRow.isNullAt(0)) wm
                  else math.max(wm, maxRow.getLong(0))
      if (newWm > wm) writeWatermark(statePath, newWm)
      Some(RunResult(fetched, inserted, newWm))
    } finally running.set(false)
  }
}
