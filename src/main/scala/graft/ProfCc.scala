package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfCc {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // mimic chainCorpus
    val d = Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
      .select(col("doc_id"), graft.ops.Dedup.tokens(col("text")).as("toks"), col("text"))
    def prefix(frac: Double) =
      array_join(slice(col("toks"), lit(1), ceil(size(col("toks")) * frac).cast("int")), " ")
    val corpus = d.select(col("doc_id"), col("text"))
      .unionByName(d.select((col("doc_id") + 100000L).as("doc_id"), prefix(0.80).as("text")))
      .unionByName(d.select((col("doc_id") + 200000L).as("doc_id"), prefix(0.64).as("text")))
      .repartition(spark.sparkContext.defaultParallelism)
    t("corpus count")(corpus.count())
    val verified = graft.ops.Dedup.verifiedNearDupPairs(corpus, 0.7)
    t("verified count")(verified.count())
    t("verified count again")(verified.count())
    val cc = graft.ops.Dedup.connectedComponentKeepers(corpus, 0.7)
    t("cc full")(cc.count())
    CacheScope.flush()
    t("cc full second")(graft.ops.Dedup.connectedComponentKeepers(corpus, 0.7).count())
    spark.stop()
  }
}
