package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val emb = spark.range(0, n, 1, 64).select(
      col("id").as("vec_id"),
      array((0 until dim).map(j =>
        (pmod(col("id") * (2 * j + 7) + j * 2654435761L, lit(100003L))
          .cast("double") / 100003.0d - 0.5d).cast("float")): _*).as("embedding"))
      .cache()
    emb.count()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    timed("kmeans training only") {
      ops.Sim.kmeansCentroidsSampledLocal(emb, 64, 4, 100)
    }
    timed("ivf first-N (search only)") {
      println("[probe]   rows=" + ops.Sim.cosineTopKIvf(emb, 16, 10, 64).count())
    }
    CacheScope.flush()
    spark.stop()
  }
}
