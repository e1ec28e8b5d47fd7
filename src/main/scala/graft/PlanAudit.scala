package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries so shuffle /
  * broadcast / pushdown regressions are visible. Run:
  *   sbt "runMain graft.PlanAudit [queryName ...]"
  * No args → audits the join/scan-sensitive set.
  */
object PlanAudit {
  val defaultSet = Seq(
    "q_join_inner", "q_join_left", "q_join_semi", "q_join_full",
    "q_upsert_anti", "q_project", "q_prune_dates", "q_sim_cosine_topk",
    "q_sim_ann", "q_agg_group", "q_topk", "q_dedup_minhash",
    "q_dedup_pipeline", "q_session_window",
    "q_asof_join", "q_range_join", "q_shuffle_shard", "q_pack_sequences")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else defaultSet
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
