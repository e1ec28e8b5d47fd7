package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounding A/B for q_dsir_weights' md5 bucket bridge (VERDICT r15
  * item 4): the shipped operator hashes each gram with
  * `conv(substr(md5(gram),1,8),16,10) % B` because the DuckDB oracle
  * must recompute IDENTICAL features (the cross-engine hash-parity
  * contract — xxhash64's seed/mix has no DuckDB twin). This harness
  * times the identical pipeline with the only change being the bucket
  * expression —
  *   A: md5 bridge           (shipped, oracle-checkable)
  *   B: xxhash64(gram) % B   (codegen'd single mix, engine-native)
  * under bench conditions, so the flag's md5 share is a MEASURED
  * contract cost, not an assumption. The oracle keeps md5 either way;
  * B is bench-only (its buckets differ, so it can never be served).
  */
object DsirAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val buckets = 256
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
      .repartition(graft.Tables.fanWidthFor(spark, sfDir, "documents"))
    docs.cache(); docs.count() // warm base, like Bench's pool

    import graft.ops.{Dedup, Text}
    // the dsirWeights chain with a pluggable bucket fn (everything
    // else verbatim: one tokenize+explode pass, cached, fused B-row
    // histogram, broadcast ratio, doc-keyed exact-long fold)
    def weights(bucketFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val hashed = CacheScope.cached(docs
        .select(col("doc_id"), col("lang"), (col("lang") === "en").as("tgt"),
          Dedup.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"), col("tgt"),
          explode(Text.dsirGrams(col("toks"))).as("gram"))
        .withColumn("bucket", bucketFn(col("gram")))
        .drop("gram"))
      hashed.join(broadcast(Text.dsirRatioPlan(hashed, buckets)), Seq("bucket"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_grams"), sum(col("loglr_u6")).as("u6"))
        .select(col("doc_id"), col("lang"), col("n_grams"),
          (col("u6") / lit(1e6)).as("logw_r"))
    }
    def mdBucket(g: org.apache.spark.sql.Column) = Text.dsirBucket(g, buckets)
    def xxBucket(g: org.apache.spark.sql.Column) = pmod(xxhash64(g), lit(buckets.toLong))

    def time(tag: String, mk: () => DataFrame): Unit = {
      val walls = (1 to reps).map { _ =>
        CacheScope.flush()
        val t0 = System.nanoTime()
        val n = mk().orderBy(col("doc_id")).collect().length
        val w = (System.nanoTime() - t0) / 1e9
        require(n > 0, s"$tag returned no rows")
        w
      }
      println(f"$tag%-18s min=${walls.min}%.3f  med=${walls.sorted.apply(reps / 2)}%.3f  all=${walls.map(w => f"$w%.3f").mkString(",")}")
    }
    for (_ <- 1 to 2) {
      time("A_md5_bridge", () => weights(mdBucket))
      time("B_xxhash64", () => weights(xxBucket))
    }
    spark.stop()
  }
}
