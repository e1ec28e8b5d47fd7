package graft

import org.apache.spark.sql.SparkSession

/** Poor-man's sampling profiler for DRIVER-side query construction:
  * run a query body's construct+plan in a loop while a sampler thread
  * captures the main thread's stack every few ms, then histogram the
  * hottest frames. Answers "where do the ~12 s of per-bench-run plan
  * construction actually go" without external tooling.
  * Usage: runMain graft.ConstructProf <query>[,<query>...] [sfDir] [loops]
  */
object ConstructProf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val loops = if (args.length > 2) args(2).toInt else 30
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prepare(spark, sfDir) catch { case _: Throwable => () }
    // one warm pass
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)

    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = main.getStackTrace
        // bucket by the deepest "interesting" frame: first catalyst /
        // spark.sql frame, else the top frame
        val frame = st.find { e =>
          val c = e.getClassName
          c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
          c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
          c.startsWith("org.apache.spark.sql.catalyst.trees") ||
          c.startsWith("org.apache.spark.sql.catalyst.plans") ||
          c.startsWith("org.apache.spark.sql.catalyst.expressions") ||
          c.startsWith("org.apache.spark.sql.execution.datasources") ||
          c.startsWith("org.apache.spark.sql.classic")
        }.orElse(st.headOption)
        frame.foreach { e =>
          val key = e.getClassName + "." + e.getMethodName
          hist.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
        }
        // also top-level phase attribution
        val phase =
          if (st.exists(_.getClassName.contains("catalyst.analysis"))) "ANALYSIS"
          else if (st.exists(_.getClassName.contains("catalyst.optimizer"))) "OPTIMIZER"
          else if (st.exists(_.getClassName.contains("execution.SparkStrategies")) ||
                   st.exists(_.getClassName.contains("execution.QueryExecution"))) "PHYS/QE"
          else if (st.exists(_.getClassName.contains("datasources"))) "DATASOURCE"
          else "OTHER"
        hist.computeIfAbsent("__phase__" + phase, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
        Thread.sleep(2)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    for (_ <- 1 to loops; n <- names) {
      CacheScope.flush()
      SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
    }
    val sec = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(50)
    println(f"== $loops loops over ${names.size} queries: ${sec}%.2f s total, ${sec / loops / names.size * 1000}%.1f ms per construct+plan")
    import scala.jdk.CollectionConverters._
    val total = hist.asScala.collect { case (k, v) if k.startsWith("__phase__") => v.get() }.sum.toDouble
    hist.asScala.toSeq.sortBy(-_._2.get()).take(30).foreach { case (k, v) =>
      println(f"${v.get()}%6d  ${if (k.startsWith("__phase__")) f"[${100 * v.get() / total}%.0f%%] " + k else k}")
    }
    spark.stop()
  }
}
