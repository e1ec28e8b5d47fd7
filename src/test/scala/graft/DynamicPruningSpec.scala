package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning on the date-sharded events layout: when
  * the date filter lives on a joined dimension (not on the fact
  * table), Catalyst must still prune fact partitions at RUNTIME via
  * the broadcast side — at 100 TB this is the difference between
  * scanning 3 day-directories and scanning all of them, with the
  * selective predicate arriving only through the join.
  */
class DynamicPruningSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("date filter on the dimension prunes fact partitions at runtime") {
    // at test scale the cost model sees no benefit in pruning a tiny
    // table — force the fallback ratio so the REWRITE itself (the part
    // that matters at 100 TB, where the heuristic passes on its own)
    // is exercised and pinned
    val prevStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
    try testBody()
    finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }

  private def testBody(): Unit = {
    val dir = Files.createTempDirectory("graft-dpp").toString + "/facts"
    (0 until 2000)
      .map(i => (i.toLong, s"2024-01-${"%02d".format(1 + i % 20)}", i * 1.0))
      .toDF("event_id", "event_date", "value")
      .write.partitionBy("event_date").parquet(dir)
    val facts = spark.read.parquet(dir)
    // dimension holds the date semantics; only 2 of 20 days survive its
    // filter. It must be a REAL scan — a local relation would have its
    // filter constant-folded away and DPP sees no selective predicate.
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    (1 to 20)
      .map(i => (s"2024-01-${"%02d".format(i)}", if (i <= 2) "keep" else "skip"))
      .toDF("d", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = facts
      .join(dim.filter($"tag" === "keep"), facts("event_date") === dim("d"))
      .agg(sum($"value").as("total"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$plan")
    // and the answer is right: days 01 and 02 only
    val expected = (0 until 2000)
      .filter(i => 1 + i % 20 <= 2).map(_ * 1.0).sum
    assert(joined.head().getDouble(0) === expected)
  }
}
