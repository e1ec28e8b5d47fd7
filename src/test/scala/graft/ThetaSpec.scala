package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the Theta/KMV set-algebra sketch
  * (ops/Sketches.thetaSetOps): exact mode below k, identical /
  * disjoint / planted-overlap groups, estimator error band in
  * sampling mode, and the internal consistency laws
  * (union = |A|' + |B|' − inter over the shared theta).
  */
class ThetaSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.Sketches

  test("exact mode: groups below k report exact set algebra") {
    // two 30-key groups sharing 10 keys — both sketches exact at k=64
    val rows = ((0 until 30).map(i => ("a", s"k$i")) ++
      (20 until 50).map(i => ("b", s"k$i"))).toDF("g", "k")
    val r = Sketches.thetaSetOps(rows, "g", "k", k = 64).collect().head
    assert(r.getAs[Long]("n_exact_union") === 50L)
    assert(r.getAs[Long]("n_exact_inter") === 10L)
    // exact mode: estimates equal the exact answers exactly
    assert(r.getAs[Double]("union_est_r") === 50.0)
    assert(r.getAs[Double]("inter_est_r") === 10.0)
    assert(r.getAs[Double]("diff_ab_est_r") === 20.0)
  }

  test("identical and disjoint groups behave at the extremes") {
    val ident = ((0 until 500).map(i => ("a", s"k$i")) ++
      (0 until 500).map(i => ("b", s"k$i"))).toDF("g", "k")
    val ri = Sketches.thetaSetOps(ident, "g", "k", k = 64).collect().head
    // identical sets: intersection estimate == union estimate
    assert(ri.getAs[Double]("inter_est_r") === ri.getAs[Double]("union_est_r"))
    assert(ri.getAs[Double]("diff_ab_est_r") === 0.0)
    val disj = ((0 until 500).map(i => ("a", s"x$i")) ++
      (0 until 500).map(i => ("b", s"y$i"))).toDF("g", "k")
    val rd = Sketches.thetaSetOps(disj, "g", "k", k = 64).collect().head
    // disjoint: intersection estimate is exactly 0 (no shared hashes)
    assert(rd.getAs[Double]("inter_est_r") === 0.0)
  }

  test("sampling mode: estimates land within the KMV error band") {
    // 2000-key groups with a planted 50% overlap; k=64 gives
    // RSE ~ 1/sqrt(k-2) ~ 13% on the union — assert a generous 4-sigma
    val rows = ((0 until 2000).map(i => ("a", s"k$i")) ++
      (1000 until 3000).map(i => ("b", s"k$i"))).toDF("g", "k")
    val r = Sketches.thetaSetOps(rows, "g", "k", k = 64).collect().head
    assert(r.getAs[Long]("n_exact_union") === 3000L)
    assert(r.getAs[Long]("n_exact_inter") === 1000L)
    val u = r.getAs[Double]("union_est_r")
    val i = r.getAs[Double]("inter_est_r")
    val d = r.getAs[Double]("diff_ab_est_r")
    assert(u > 1500 && u < 4500, s"union estimate out of band: $u")
    assert(i > 250 && i < 2500, s"intersection estimate out of band: $i")
    // internal consistency below the common theta:
    // diff(A,B) + inter == |A below theta| scaled — so diff >= 0 and
    // union >= max(inter, diff)
    assert(d >= 0.0 && u >= i && u >= d)
  }

  test("empty input yields no pairs") {
    val empty = Seq.empty[(String, String)].toDF("g", "k")
    assert(Sketches.thetaSetOps(empty, "g", "k").count() === 0)
  }
}
