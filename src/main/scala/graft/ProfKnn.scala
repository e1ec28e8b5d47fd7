package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the kNN-vote pipeline (round 7). */
object ProfKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import spark.implicits._
    for (s <- 1 to 3) {
      val emb = Tables.embeddings(spark, sfDir)
      val asDouble = emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      val dotF = graft.ops.Sim.dotNative(spark) _
      def normF(c: org.apache.spark.sql.Column) = sqrt(dotF(c, c))
      val labeled = asDouble.filter(pmod(col("vec_id"), lit(10L)) =!= 0)
        .select(col("vec_id").as("c_id"), col("label").as("c_label"),
          col("v").as("cv"), normF(col("v")).as("cn"))
      val qRows = t(s"[$s] collect holdout")(
        asDouble.filter(pmod(col("vec_id"), lit(10L)) === 0).orderBy("vec_id").collect())
      val flat = qRows.flatMap(_.getSeq[Double](2))
      val scored = labeled.select(col("c_id"), col("c_label").cast("long").as("c_label"),
        posexplode(call_function("graft_all_cos",
          col("cv"), col("cn"), typedlit(flat), lit(qRows.length)))
          .as(Seq("q_idx", "cos")))
        .select(col("q_idx"), round(col("cos"), 4).as("cos_r"), col("c_id"), col("c_label"))
      t(s"[$s] score+explode count")(scored.count())
      t(s"[$s] score+agg-exprform")(
        scored.groupBy(col("q_idx"))
          .agg(slice(array_sort(collect_list(struct((-col("cos_r")).as("ns"),
            col("c_id"), col("c_label")))), 1, 5).as("top")).count())
      val topAgg = new graft.ops.TopK.TopKPayloadAggregator(5).toColumn
      t(s"[$s] score+agg-typed")(
        scored.as[(Int, Double, Long, Long)]
          .groupByKey(_._1)
          .mapValues { case (_, c, i, l) => (c, i, l) }
          .agg(topAgg.name("top")).count())
      // r6 window form reconstructed for A/B
      val holdout = asDouble.filter(pmod(col("vec_id"), lit(10L)) === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("v").as("qv"), normF(col("v")).as("qn"))
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("c_id").asc)
      val wVote = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("votes").desc, col("c_label").asc)
      val oldQ = labeled.join(broadcast(holdout), lit(true))
        .select(col("q_id"), col("q_label"), col("c_id"), col("c_label"),
          round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 4).as("cos_r"))
        .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(wTop))
        .filter(col("rnk") <= 5)
        .groupBy(col("q_id"), col("q_label"), col("c_label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", org.apache.spark.sql.functions.row_number().over(wVote))
        .filter(col("vr") === 1)
        .select(col("q_id").as("vec_id"), col("q_label").as("label"),
          col("c_label").as("pred_label"), col("votes"),
          when(col("c_label") === col("q_label"), 1L).otherwise(0L).as("correct"))
        .orderBy(col("vec_id"))
      t(s"[$s] OLD window form")(oldQ.count())
      t(s"[$s] NEW no-orderBy")(graft.ops.Sim.knnLabelVote(emb, 10, 5).count())
      t(s"[$s] NEW with orderBy")(graft.ops.Sim.knnLabelVote(emb, 10, 5).orderBy(col("vec_id")).count())

      t(s"[$s] full query")(SparkEntry.queries("q_knn_vote")(spark, sfDir).count())
    }
    spark.stop()
  }
}
