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
    if (args.headOption.contains("phases")) {
      // phase breakdown of the CC operator's parts on the same corpus
      import org.apache.spark.sql.functions._
      val chain = graft.ops.Dedup
      val c = SparkEntry.chainCorpusForProf(spark, sfDir)
      CacheScope.flush()
      t("chain corpus read+cache")(c.count())
      val sh = CacheScope.cached(chain.hashedShingles(c))
      t("hashedShingles")(sh.count())
      val verified = CacheScope.cached(chain.verifiedNearDupPairs(c, 0.7))
      t("verified edges (LSH+verify)")(verified.count())
      t("full CC op fresh on top of warm base")(chain.connectedComponentKeepers(c, 0.7).count())
      CacheScope.flush()
      spark.stop(); return
    }
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
