package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AllCosines

/** Kernel laws for the native all-cosines expression
  * (graft.plans.AllCosines) plus the payload-carrying bounded top-k
  * aggregator — the two halves of the kNN-vote rewrite. The
  * DataFrame-level contract is covered by the q_knn_vote oracle; this
  * pins the kernel math and the kernel-vs-fallback path parity.
  */
class AllCosinesSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def arr(xs: Double*) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs.toArray)

  private def l2(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)

  test("compute matches the per-pair fold dot / norm product") {
    val dim = 8
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      ((seed * 37 + i * 7919) % 997) / 997.0 - 0.5)
    val qs = (0 until 5).map(c => vec(c + 50))
    val m = AllCosines.Model(qs.flatten.toArray, qs.size)
    for (s <- 0 until 10) {
      val v = vec(s)
      val got = AllCosines.compute(arr(v: _*), l2(v), m).toDoubleArray.toSeq
      val ref = qs.map { q =>
        // same fold order as the kernel: sequential index order
        var dot = 0.0
        for (i <- 0 until dim) dot += v(i) * q(i)
        dot / (l2(v) * l2(q))
      }
      assert(got === ref, s"candidate seed $s")
    }
  }

  test("expression through SQL: null vector yields null") {
    val qs = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq((1L, Some(Seq(3.0, 4.0))), (2L, None)).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("aggregate(transform(v, x -> x*x), 0d, (a, x) -> a + x)")))
      .withColumn("cos", call_function("graft_all_cos",
        col("v"), col("nrm"), typedlit(qs.flatten), lit(2)))
      .select(col("id"), col("cos")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = rows(1L).get.asInstanceOf[scala.collection.Seq[Double]]
    assert(math.abs(got(0) - 0.6) < 1e-12 && math.abs(got(1) - 0.8) < 1e-12)
    assert(rows(2L) === None)
  }

  test("TopKPayloadAggregator: bounded insert keeps (score desc, id asc), payload rides") {
    val agg = new graft.ops.TopK.TopKPayloadAggregator(3)
    val items = Seq(
      (0.5, 10L, 100L), (0.9, 3L, 300L), (0.9, 1L, 111L),
      (0.1, 7L, 700L), (0.7, 2L, 200L), (0.9, 5L, 500L))
    val direct = items.foldLeft(agg.zero)(agg.reduce)
    assert(direct === Seq((0.9, 1L, 111L), (0.9, 3L, 300L), (0.9, 5L, 500L)))
    // merge of split halves equals the all-at-once fold
    val (h1, h2) = items.splitAt(3)
    val merged = agg.merge(h1.foldLeft(agg.zero)(agg.reduce),
      h2.foldLeft(agg.zero)(agg.reduce))
    assert(merged === direct)
  }

  test("knnLabelVote: kernel path and BNLJ fallback agree row-for-row") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = graft.ops.Sim.knnLabelVoteImpl(emb, 10, 5, useKernel = true)
      .orderBy(col("vec_id")).collect().toSeq
    val b = graft.ops.Sim.knnLabelVoteImpl(emb, 10, 5, useKernel = false)
      .orderBy(col("vec_id")).collect().toSeq
    assert(a.nonEmpty && a === b)
  }
}
