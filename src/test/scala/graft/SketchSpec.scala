package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable sketch aggregates — the 100 TB substitutes for exact
  * frequency/membership: a count-min sketch never undercounts and
  * stays within its epsilon bound; a Bloom filter has no false
  * negatives. Both are Spark built-ins (fixed-size state, map-side
  * partial merge), which is exactly why they are the scale path for
  * heavy-hitters and IN-list pre-filters.
  */
class SketchSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val words =
    (1 to 2000).map(i => if (i % 4 == 0) "hot" else s"w${i % 97}")
  private lazy val df = words.toDF("w")

  test("count-min sketch: estimate >= truth, within eps * N") {
    val eps = 0.01
    val bytes = df
      .agg(count_min_sketch($"w", lit(eps), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sk = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val truth = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((w, n) <- truth) {
      val est = sk.estimateCount(w)
      assert(est >= n, s"$w undercounted")
      assert(est <= n + (eps * words.size).ceil.toLong, s"$w overshoots the eps bound")
    }
  }

  test("count-min sketch merges across partitions like one global sketch") {
    // the agg above already exercises partial merge; pin that the
    // repartitioned aggregate yields identical estimates
    val bytes8 = df.repartition(8)
      .agg(count_min_sketch($"w", lit(0.01), lit(0.99), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sk8 = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes8))
    assert(sk8.estimateCount("hot") >= 500L)
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val bf = df.stat.bloomFilter("w", 200, 0.01)
    assert(words.distinct.forall(bf.mightContain), "false negative")
    val fp = (1 to 1000).map(i => s"absent$i").count(bf.mightContain)
    assert(fp <= 50, s"false-positive rate out of band: $fp/1000")
  }
}
