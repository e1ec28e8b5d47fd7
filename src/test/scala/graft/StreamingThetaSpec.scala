package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins the streaming Theta/KMV sketch
  * (streaming/StreamingAggregates.thetaSketchStream) to the batch
  * bottom-k on the same rows — including when the rows arrive split
  * across micro-batches (KMV mergeability is what makes the stream
  * form sound), and checks the bounded-state and estimate contracts.
  */
class StreamingThetaSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.streaming.StreamingAggregates.{ThetaInput, ThetaOut}

  // reference bottom-k: same md5-prefix hash as h32 / the stream fold
  private def refSketch(keys: Seq[String], k: Int): Vector[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.map(s => java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(8), 16))
      .distinct.sorted.take(k).toVector
  }

  test("streamed state == batch bottom-k, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val k = 16
    val keysA = (0 until 200).map(i => s"a$i")
    val keysB = (0 until 10).map(i => s"b$i") // exact mode (< k)
    val in = MemoryStream[ThetaInput]
    val q = graft.streaming.StreamingAggregates
      .thetaSketchStream(in.toDS(), k = k)
      .writeStream.format("memory").queryName("theta_sink")
      .outputMode(OutputMode.Update).start()
    try {
      // batch 1: first half of A + all of B; batch 2: second half of A
      // (with duplicates of batch-1 keys — distinct-ness must hold)
      in.addData(keysA.take(100).map(ThetaInput("a", _)) ++
        keysB.map(ThetaInput("b", _)))
      q.processAllAvailable()
      in.addData(keysA.drop(100).map(ThetaInput("a", _)) ++
        keysA.take(20).map(ThetaInput("a", _)))
      q.processAllAvailable()
      val out = spark.table("theta_sink").as[ThetaOut].collect()
      // the LAST emission per group is the final state
      val fin = out.zipWithIndex.groupBy(_._1.g)
        .map { case (g, rs) => g -> rs.maxBy(_._2)._1 }
      assert(fin("a").hs === refSketch(keysA, k),
        "group a: streamed bottom-k diverged from the batch fold")
      assert(fin("a").n_sk === k.toLong)
      assert(fin("a").theta === refSketch(keysA, k).last.toDouble / 4294967296.0)
      assert(fin("a").est === (k - 1).toDouble / fin("a").theta)
      // exact mode: every hash retained, theta 1, estimate == size
      assert(fin("b").hs === refSketch(keysB, k))
      assert(fin("b").theta === 1.0 && fin("b").est === keysB.size.toDouble)
      // bounded state: no emission ever carries more than k hashes
      assert(out.forall(_.hs.size <= k))
      // mid-stream emission after batch 1 carried batch-1-only state
      val firstA = out.zipWithIndex.filter(_._1.g == "a").minBy(_._2)._1
      assert(firstA.hs === refSketch(keysA.take(100), k))
    } finally q.stop()
  }
}
