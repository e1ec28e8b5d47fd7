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
    // "all" mode: sweep EVERY declared query (no execute — driver-side
    // construct+plan only, min over reps after one warm pass) and print
    // the per-query and total driver cost, worst first. Quantifies how
    // much of the bench headline is plan-tree building + analysis.
    if (name == "all") {
      val warmAndTime = (fn: (SparkSession, String) => org.apache.spark.sql.DataFrame) => {
        val samples = (1 to math.max(2, reps)).map { _ =>
          CacheScope.flush()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan
          val t2 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
        }
        samples.drop(1).minBy(t => t._1 + t._2)
      }
      val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (q, fn) =>
        try Some((q, warmAndTime(fn))) catch { case _: Throwable => None }
      }
      rows.sortBy { case (_, (c, p)) => -(c + p) }.take(40).foreach {
        case (q, (c, p)) => println(f"$q%-26s construct $c%.3f  plan $p%.3f")
      }
      val tc = rows.map(_._2._1).sum; val tp = rows.map(_._2._2).sum
      println(f"== TOTAL over ${rows.size} queries: construct $tc%.2f s, plan $tp%.2f s, driver $tc+$tp = ${tc + tp}%.2f s")
      spark.stop(); return
    }
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
