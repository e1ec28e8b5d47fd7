package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `approx_percentile` is the declared 100 TB substitute for
  * `q_percentile`'s exact interpolated percentiles (single pass,
  * mergeable sketch, bounded state). This pins the substitution
  * contract: with accuracy parameter A, the rank error is at most
  * n/A, so the approximate p50/p90 must land within that rank band of
  * the exact order statistics.
  */
class ApproxPercentileSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_percentile lands within the rank-error band of the exact answer") {
    val n = 20000
    val accuracy = 1000 // rank error ≤ n/accuracy = 20 ranks
    // deterministic, skewed values: quadratic growth tests the sketch
    // where quantile density varies
    val values = (0 until n).map(i => (i.toLong % 7, (i.toLong * i) / 1000.0))
    val df = values.toDF("g", "v").repartition(8)

    val approx = df.agg(
      expr(s"approx_percentile(v, array(0.5, 0.9), $accuracy)").as("p"))
      .head().getSeq[Double](0)

    val sorted = values.map(_._2).sorted
    def rankOf(x: Double): Int = sorted.count(_ <= x)
    for ((p, i) <- Seq(0.5, 0.9).zipWithIndex) {
      val targetRank = (p * n).toInt
      val err = math.abs(rankOf(approx(i)) - targetRank)
      assert(err <= n / accuracy + 1,
        s"p$p: approx ${approx(i)} at rank ${rankOf(approx(i))}, target $targetRank")
    }
  }

  test("grouped approx_percentile merges partition sketches per key") {
    val df = (0 until 9000).map(i => (i % 3, i.toDouble)).toDF("g", "v").repartition(16)
    val rows = df.groupBy($"g")
      .agg(expr("approx_percentile(v, 0.5, 1000)").as("p50"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // each group is an arithmetic progression (g, g+3, ...): true
    // median ≈ 4500 ± small rank error
    for (g <- 0 until 3)
      assert(math.abs(rows(g) - 4500.0) < 60.0, s"group $g: ${rows(g)}")
  }
}
