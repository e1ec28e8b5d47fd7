package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry query
  * at sf0.001 (plan shape only — strategy choices match the bench's
  * AQE-off config).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").explain("formatted")
    spark.stop()
  }
}
