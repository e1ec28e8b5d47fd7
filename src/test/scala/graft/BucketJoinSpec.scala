package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join (round 12): writing both join sides as
  * same-width bucket tables on the join key buys every downstream
  * join/agg on that key an exchange-free plan — the canonical 100 TB
  * layout answer to a repeated big join. These tests pin BOTH halves
  * of the claim on a synthetic pair: (1) the relational answer is
  * row-for-row identical to the plain shuffled join, (2) the executed
  * plan contains a SortMergeJoin and ZERO shuffle exchanges keyed on
  * the bucket column (the only exchanges are the final small fold and
  * the orderBy range partition).
  */
class BucketJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // flatten through AQE wrappers: the finalized plan nests completed
  // stages as QueryStageExec leaves whose real subtree hangs off .plan
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flatten(s.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Seq[ShuffleExchangeExec] = {
    df.collect() // materialize so AQE finalizes the plan
    flatten(df.queryExecution.executedPlan).collect { case s: ShuffleExchangeExec => s }
  }

  private def smjs(df: org.apache.spark.sql.DataFrame): Int =
    flatten(df.queryExecution.executedPlan).collect { case j: SortMergeJoinExec => j }.size

  test("bucketed pair joins and pre-aggregates with zero key exchanges, same answer") {
    val base = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val orders = (0L until 4000L).map(i => (i, i % 500, (i % 97).toDouble + 0.25))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = (0L until 500L).map(i => (i, (i % 7).toInt, i.toDouble))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    orders.repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/o").mode("overwrite").saveAsTable("bj_orders")
    cust.repartition(8, col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/c").mode("overwrite").saveAsTable("bj_cust")
    try {
      def shaped(o: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
        o.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("tp"))
          .hint("MERGE")
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(sum(col("n_orders")).as("n_orders"), count(lit(1)).as("n_customers"),
            round(sum(col("tp")), 2).as("total_r"))
          .orderBy(col("nationkey"))
      val bucketed = shaped(spark.table("bj_orders"), spark.table("bj_cust"))
      val plain = shaped(orders, cust)
      // (1) identical answers, layout-independent
      assert(bucketed.collect().map(_.toSeq).toSeq === plain.collect().map(_.toSeq).toSeq)
      // (2) the bucketed plan: a real SMJ, and NO exchange mentions the
      // bucket key — the only shuffles are the nation fold + orderBy
      assert(smjs(bucketed) === 1, "expected a sort-merge join")
      val ex = shuffles(bucketed)
      assert(ex.forall(e => !e.outputPartitioning.toString.contains("custkey")),
        s"bucket-key exchange leaked into the plan: ${ex.map(_.outputPartitioning)}")
      // the PLAIN layout pays key exchanges on the same shape — the
      // contrast that proves the bucketing is what removed them
      assert(shuffles(plain).exists(_.outputPartitioning.toString.contains("custkey")),
        "control: the unbucketed twin should shuffle on the key")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_cust")
    }
  }

  test("re-registering the existing bucketed files by DDL keeps the exchange-free plan") {
    // a fresh session (new JVM) only has the FILES — the catalog entry
    // is re-created by DDL over LOCATION; the plan must stay bucketed
    val base = java.nio.file.Files.createTempDirectory("graft-bucket2").toString
    val orders = (0L until 1000L).map(i => (i, i % 100, 1.5))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    orders.repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/o").mode("overwrite").saveAsTable("bj_tmp")
    spark.sql("DROP TABLE bj_tmp") // drops catalog entry; external files stay
    spark.sql(
      s"""CREATE TABLE bj_reg (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
         |USING parquet CLUSTERED BY (o_custkey) SORTED BY (o_custkey)
         |INTO 8 BUCKETS LOCATION '$base/o'""".stripMargin)
    try {
      val agg = spark.table("bj_reg").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      assert(agg.collect().length === 100)
      assert(shuffles(agg).isEmpty,
        "bucketed pre-aggregate must not exchange after DDL re-registration")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_reg")
    }
  }
}
