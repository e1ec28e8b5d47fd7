package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffling at write time: two tables bucketed the
  * same way on the join key join WITHOUT a runtime exchange. At 100 TB
  * this turns every recurring fact-fact join on the same key into a
  * scan-side merge — the write cost is paid once, not per query.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("same-bucketed tables join with no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val orders = (0 until 1000).map(i => (i.toLong % 50, i.toLong, s"o$i"))
      .toDF("custkey", "orderkey", "note")
    val customer = (0 until 50).map(i => (i.toLong, s"c$i")).toDF("custkey", "name")

    orders.write.bucketBy(8, "custkey").sortBy("custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "custkey").sortBy("custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable auto-broadcast so the join would otherwise need a shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
