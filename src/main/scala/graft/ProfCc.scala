package graft
import org.apache.spark.sql.SparkSession
object ProfCc {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    SparkEntry.prepare(spark, sfDir)
    val names = if (args.isEmpty) Array("q_dedup_cc") else args
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      CacheScope.flush()
      t(s"$n sample 1")(fn(spark, sfDir).count())
      CacheScope.flush()
      t(s"$n sample 2")(fn(spark, sfDir).count())
      CacheScope.flush()
      t(s"$n sample 3")(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
