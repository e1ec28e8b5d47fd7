package graft

import org.apache.spark.sql.SparkSession

/** Local replica of the driver's t1 smoke gate: SparkEntry.entry on
  * sf0.001 must return rows > 0. Prints the count and a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.show(5, false)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
