package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the retrieval-family top-k back-half (VERDICT r12
  * items 3+5): measures, under bench conditions (local[32], 8 shuffle
  * partitions, AQE off, warm store), the three candidate shapes for
  * bm25/sparse-cosine's post-join stage —
  *   A: groupBy(q,doc) + rank window               (current shape)
  *   B: groupBy(q,doc) + collect_list/array_sort   (expression top-k)
  *   C: repartition(q) + complete agg + window     (single exchange)
  * plus a control query for window adjustment. Results go to stdout;
  * the winner lands in ops/Text.scala with the losers recorded in
  * BASELINE.md's dead-end table.
  */
object RetrievalAB {
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
    SparkEntry.prepare(spark, sfDir)
    val store = EntrySupport.tokPostings(spark, sfDir)
    store.cache(); store.count() // warm, like Bench's base pool
    val qB = EntrySupport.tokPostingsQueryLocal(spark, sfDir, 20)

    def scoredBm25: DataFrame = store
      .join(broadcast(qB.select(col("q_id"), col("token"))), Seq("token"))
      .filter(col("q_id") =!= col("doc_id"))

    // A: current — groupBy(q,doc) then rank window
    def bm25A: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val s = scoredBm25.groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_common"), round(sum(col("bm_w")), 4).as("bm25_r"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("bm25_r").desc, col("doc_id").asc)
      s.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 5)
        .select(col("q_id"), col("doc_id").as("c_id"), col("n_common"), col("bm25_r"), col("rnk"))
    }
    // B: expression top-k (collect_list/array_sort/slice, payload rides)
    def bm25B: DataFrame = {
      val s = scoredBm25.groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_common"), round(sum(col("bm_w")), 4).as("bm25_r"))
      s.groupBy(col("q_id"))
        .agg(slice(array_sort(collect_list(struct(
          (-col("bm25_r")).as("ns"), col("doc_id").as("id"), col("n_common").as("nc")))),
          1, 5).as("top"))
        .select(col("q_id"), posexplode(col("top")).as(Seq("i", "t")))
        .select(col("q_id"), col("t.id").as("c_id"), col("t.nc").as("n_common"),
          (-col("t.ns")).as("bm25_r"), (col("i") + 1).cast("long").as("rnk"))
    }
    // C: one exchange — repartition(q) up front, agg + window colocated
    def bm25C: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val s = scoredBm25
        .select(col("q_id"), col("doc_id"), col("bm_w"))
        .repartition(col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_common"), round(sum(col("bm_w")), 4).as("bm25_r"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("bm25_r").desc, col("doc_id").asc)
      s.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 5)
        .select(col("q_id"), col("doc_id").as("c_id"), col("n_common"), col("bm25_r"), col("rnk"))
    }
    // the same three shapes over the sparse-cosine skeleton (identical
    // join, different score column + null-weight filter)
    def scoredCos: DataFrame = store.filter(col("wn").isNotNull)
      .join(broadcast(qB.filter(col("qw").isNotNull)
        .select(col("q_id"), col("token"), col("qw"))), Seq("token"))
      .filter(col("q_id") =!= col("doc_id"))
    def cosAgg(in: DataFrame): DataFrame = in
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_common"),
        round(sum(col("wn") * col("qw")), 4).as("cos_r"))
    def cosA: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_r").desc, col("doc_id").asc)
      cosAgg(scoredCos)
        .withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 5)
    }
    def cosB: DataFrame = cosAgg(scoredCos)
      .groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("cos_r")).as("ns"), col("doc_id").as("id"), col("n_common").as("nc")))),
        1, 5).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("q_id"), col("t.id").as("doc_id"), col("t.nc").as("n_common"),
        (-col("t.ns")).as("cos_r"), (col("i") + 1).cast("long").as("rnk"))
    def cosC: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_r").desc, col("doc_id").asc)
      cosAgg(scoredCos
          .select(col("q_id"), col("doc_id"), col("wn"), col("qw"))
          .repartition(col("q_id")))
        .withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 5)
    }
    // D: shrink the exchange rows — project the per-posting product
    // map-side BEFORE the shuffle so only (q, doc, contrib) longs/
    // doubles travel (the verdict's "pre-aggregate per-token partials
    // map-side" lever, expressed as a narrower shuffle row)
    def cosD: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_r").desc, col("doc_id").asc)
      scoredCos
        .select(col("q_id"), col("doc_id"), (col("wn") * col("qw")).as("p"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_common"), round(sum(col("p")), 4).as("cos_r"))
        .withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 5)
    }
    // E/F: BOUNDING variants (round 13) — how much of the wall is the
    // irreducible store scan vs the broadcast join, independent of any
    // scoring/top-k rewrite. E = scan+per-doc count only (no join);
    // F = the join materialized but nothing downstream. If E+F ≈ A,
    // no kernel-scored join can move the number — the scan IS the cost.
    def cosE_scanOnly: DataFrame = store.filter(col("wn").isNotNull)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    def cosF_joinOnly: DataFrame = scoredCos
      .select(col("doc_id"), col("q_id"))

    // control: window-adjustment anchor (memory: always run a control)
    def control: DataFrame = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)

    val variants = Seq(
      "control " -> (() => control),
      "bm25_A_window " -> (() => bm25A),
      "bm25_B_exprTopK" -> (() => bm25B),
      "bm25_C_oneExch " -> (() => bm25C),
      "cos_A_window " -> (() => cosA),
      "cos_B_exprTopK" -> (() => cosB),
      "cos_C_oneExch " -> (() => cosC),
      "cos_D_narrow " -> (() => cosD),
      "cos_E_scanOnly" -> (() => cosE_scanOnly),
      "cos_F_joinOnly" -> (() => cosF_joinOnly))
    // equality check first (A is the oracle-checked shape)
    val a = bm25A.collect().map(_.toString).sorted
    val b = bm25B.collect().map(_.toString).sorted
    val c = bm25C.collect().map(_.toString).sorted
    println(s"B==A: ${a.sameElements(b)}  C==A: ${a.sameElements(c)}  rows=${a.length}")
    for (r <- 1 to reps) {
      val line = variants.map { case (nm, f) =>
        CacheScope.flush()
        val t0 = System.nanoTime()
        f().count()
        f"$nm ${(System.nanoTime() - t0) / 1e9}%.3f"
      }.mkString("  |  ")
      println(s"rep $r: $line")
    }
    spark.stop()
  }
}
