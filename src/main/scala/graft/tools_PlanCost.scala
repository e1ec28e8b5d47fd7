package graft

import org.apache.spark.sql.SparkSession

/** Phase profiler for a declared query: splits one sample into
  * (a) DataFrame construction (query-body execution — builds the
  * logical plan, runs any driver-side model/fixture loads),
  * (b) analysis+optimization+physical planning (forced via
  * `executedPlan`), and (c) job execution (`count()`), so floor work
  * can be attributed to the driver or the executors before surgery.
  * Usage: runMain graft.PlanCost <query> [sfDir] [reps]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.prepare(spark, sfDir) catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      CacheScope.flush()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze/optimize/plan
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      println(f"== rep $r: construct ${(t1 - t0) / 1e9}%.3f s, plan ${(t2 - t1) / 1e9}%.3f s, execute ${(t3 - t2) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
