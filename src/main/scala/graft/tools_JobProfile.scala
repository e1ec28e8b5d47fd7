package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-job wall profile of one query, run N times. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]()
    val starts = mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts(js.jobId) = (js.time, desc.take(60))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.get(je.jobId).foreach { case (t0, d) =>
          jobs += ((je.jobId, t0, je.time, d))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      spark.catalog.clearCache()
      jobs.clear(); starts.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"== rep $r: total $sec%.3f s, rows $n, jobs ${jobs.size}")
      jobs.sortBy(_._2).foreach { case (id, s, e, d) =>
        println(f"   job $id%3d  ${(e - s) / 1e3}%8.3f s  $d")
      }
    }
    spark.stop()
  }
}
