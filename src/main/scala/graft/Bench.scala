package graft
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Cumulative shuffle-write bytes across all tasks — snapshotted
    // around each query so shuffle-heavy operators are visible in the
    // output, not just slow ones. (Listener delivery is async; the
    // short settle sleep makes per-query deltas approximate but
    // directionally right.)
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // Warm up once (JIT, codegen compiler, Hadoop FS init, parquet
    // footer cache) so the one-time JVM costs don't land on whichever
    // query happens to run first.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/events.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    // Failures are reported by name, never hidden inside a timing.
    // Each query runs twice and reports the faster run: single-shot
    // timings on this host swing up to 25x from GC/JIT/scheduler
    // noise, and min-of-2 measures the engine rather than the hiccup.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        // drop caches a previous run populated, so every timed run is
        // a cold start of the query's own plan
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .takeWhile(_ != '\n').take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }
      val s0 = shuffleWrite.get()
      val t1 = once()
      Thread.sleep(50) // let listener events drain
      val sMb = (shuffleWrite.get() - s0) / 1e6
      // min-of-2: host noise arrives in sustained bursts, so more
      // samples mostly extend exposure instead of escaping the burst
      val t = if (errors.contains(name)) t1 else math.min(t1, once())
      (name, t, sMb)
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, s) => "\"" + k + "\":" + f"$s%.2f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_write_mb":$sh,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
