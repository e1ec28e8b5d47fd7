package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for q_overlap_matrix's sizes stage (VERDICT r15 item 3):
  * measures, under bench conditions, the two candidate shapes —
  *   A: separate per-source sizes aggregation over the cached
  *      (source,h) store + strict < self-join          (r14 shape)
  *   B: diagonal fold — <= self-join, sizes read off the (s,s)
  *      pairs, one fewer pass over the store           (r15 fold)
  * Winner lands in ops/Dedup.scala; the loser's timing goes to the
  * floor note so the choice is measured, not assumed.
  */
object OverlapAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
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

    def store(): DataFrame = CacheScope.cached(
      graft.ops.Dedup.docShingles0(
          docs.select(col("source").as("doc_id"), col("text")))
        .withColumn("h", xxhash64(col("shingle")))
        .select(col("doc_id").as("source"), col("h")).distinct())

    def assemble(inter: DataFrame, sizes: DataFrame): DataFrame = inter
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), Seq("src_b"))
      .select(
        col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
        round(col("n_shared") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
          .as("jaccard_r"))

    // A: r14 — separate sizes pass + strict < join
    def shapeA(): DataFrame = {
      val srcSh = store()
      val sizes = srcSh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val inter = srcSh.as("x").join(srcSh.as("y"), Seq("h"))
        .filter(col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
      assemble(inter, sizes)
    }
    // B: r15 fold — <= join, sizes off the diagonal
    def shapeB(): DataFrame = {
      val srcSh = store()
      val pairs = CacheScope.cached(
        srcSh.as("x").join(srcSh.as("y"), Seq("h"))
          .filter(col("x.source") <= col("y.source"))
          .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared")))
      val sizes = pairs.filter(col("src_a") === col("src_b"))
        .select(col("src_a").as("source"), col("n_shared").as("n"))
      assemble(pairs.filter(col("src_a") =!= col("src_b")), sizes)
    }

    def time(tag: String, mk: () => DataFrame): Unit = {
      val walls = (1 to reps).map { _ =>
        CacheScope.flush()
        val t0 = System.nanoTime()
        val n = mk().orderBy(col("src_a"), col("src_b")).collect().length
        val w = (System.nanoTime() - t0) / 1e9
        require(n > 0, s"$tag returned no rows")
        w
      }
      println(f"$tag%-28s min=${walls.min}%.3f  med=${walls.sorted.apply(reps / 2)}%.3f  all=${walls.map(w => f"$w%.3f").mkString(",")}")
    }
    // interleave so a window burst hits both shapes equally
    for (_ <- 1 to 2) { time("A_separate_sizes", shapeA _); time("B_diagonal_fold", shapeB _) }
    spark.stop()
  }
}
