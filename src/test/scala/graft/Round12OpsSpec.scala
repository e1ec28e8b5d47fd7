package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operator properties: DP count release (Laplace mechanism),
  * group-level MinHash Jaccard, and JL random projection.
  */
class Round12OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.{Relational, Sketches, Sim}

  test("dpNoisedCounts: true counts preserved, noise deterministic and epsilon-scaled") {
    val rows = Seq.tabulate(1000)(i => (s"g${i % 10}", i)).toDF("g", "v")
    val out1 = Relational.dpNoisedCounts(rows, Seq("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out1.size === 10 && out1.values.forall(_._1 === 100L))
    // deterministic: a second run is bit-identical
    val out2 = Relational.dpNoisedCounts(rows, Seq("g"), epsilon = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out1 === out2)
    // Laplace(1) noise: |noise| has median ln(2) ≈ 0.69 and P(>7) < 0.1%;
    // with 10 groups, a loose band still catches a broken inverse-CDF
    val noises = out1.values.map { case (n, dp) => dp - n }
    assert(noises.exists(_ != 0.0), "noise must not vanish")
    assert(noises.forall(n => math.abs(n) < 15.0), s"noise out of band: $noises")
    // epsilon scaling: eps = 2 halves every group's noise (same seed u)
    val half = Relational.dpNoisedCounts(rows, Seq("g"), epsilon = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((g, (n, dp)) <- out1)
      assert(math.abs((half(g) - n) - (dp - n) / 2.0) < 1e-3, s"epsilon scaling broke at $g")
  }

  test("minhashGroupJaccard: planted overlap estimated, exact column exact, identical sets read 1") {
    // A = 0..399, B = 200..599 -> J(A,B) = 200/600 = 1/3; C = copy of A
    val rows = (0 until 400).map(i => ("A", s"k$i")) ++
      (200 until 600).map(i => ("B", s"k$i")) ++
      (0 until 400).map(i => ("C", s"k$i"))
    val out = Sketches.minhashGroupJaccard(rows.toDF("g", "k"), "g", "k")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("A", "B"))._3 === BigDecimal(1.0 / 3.0).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // identical key sets: every signature component equal -> est 1.0
    assert(out(("A", "C"))._1 === 16L && out(("A", "C"))._2 === 1.0
      && out(("A", "C"))._3 === 1.0)
    // 16 perms: sigma = sqrt(J(1-J)/16) ≈ 0.12 at J=1/3; allow 3 sigma
    assert(math.abs(out(("A", "B"))._2 - 1.0 / 3.0) <= 0.36,
      s"estimate out of band: ${out(("A", "B"))}")
    // B vs C = same overlap structure as B vs A
    assert(out(("B", "C"))._3 === out(("A", "B"))._3)
  }

  test("dpNoisedSum: clamp bounds the sensitivity, noise scales with clampHi/epsilon") {
    // one outlier row per group: without the clamp it would move the
    // sum by 1e6; clamped it contributes exactly clampHi
    val rows = Seq.tabulate(400)(i => (s"g${i % 4}", (i % 50).toDouble)) ++
      Seq(("g0", 1e6), ("g1", -1e6))
    val df = rows.toDF("g", "v")
    val out = Relational.dpNoisedSum(df, Seq("g"), "v", clampHi = 100.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val base = (0 until 400).filter(_ % 4 == 0).map(i => (i % 50).toDouble).sum
    assert(out("g0")._1 === base + 100.0, "positive outlier must clamp to clampHi")
    assert(out("g1")._1 === (1 until 400).filter(_ % 4 == 1).map(i => (i % 50).toDouble).sum,
      "negative outlier must clamp to zero")
    // noise bounded by the Laplace(100) tail; deterministic
    assert(out.values.forall { case (s, dp) => math.abs(dp - s) < 1500.0 })
    val again = Relational.dpNoisedSum(df, Seq("g"), "v", clampHi = 100.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.map { case (g, (_, dp)) => g -> dp } === again)
  }

  test("hdrMergedQuantiles: merged per-group buckets == direct global bucketing, bit for bit") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 4000).map(i =>
      (s"g${i % 5}", math.exp(rnd.nextGaussian() * 1.3 + 2.0)))
    val df = rows.toDF("g", "v")
    val merged = Sketches.hdrMergedQuantiles(df, "g", "v", Seq(0.5, 0.9, 0.99))
      .collect().head
    // direct global: same operator with a constant group column
    val direct = Sketches.hdrQuantiles(
        df.withColumn("all", org.apache.spark.sql.functions.lit("x")), "all", "v",
        Seq(0.5, 0.9, 0.99))
      .collect().head
    assert(merged.getLong(0) === direct.getLong(1))
    for (i <- 0 until 3)
      assert(merged.getDouble(1 + i) === direct.getDouble(2 + i),
        s"quantile $i diverged between merged and direct")
  }

  test("cosineTopKRp: refine stage exact, output within shortlist, recall sane") {
    // clustered vectors: 10 query centroids, candidates = noisy copies,
    // so true neighbors survive a 64->16 projection comfortably
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 10).map(i => (i.toLong, centroids(i).map(_.toFloat))) ++
      (0 until 400).map { i =>
        val c = centroids(i % 10)
        (100L + i, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
      }
    val df = vecs.toDF("vec_id", "embedding")
    val out = Sim.cosineTopKRp(df, nQueries = 10, k = 5, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.length === 50)
    // exact-refine law: cos_r equals the brute-force cosine for the
    // same (q, c) pair
    val brute = Sim.cosineTopK(df, nQueries = 10, k = 410)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { case (q, c, cos) =>
      assert(cos === brute((q, c)), s"refine diverged from brute cosine at ($q, $c)")
    }
    // recall@5 vs brute force: noisy same-cluster copies should survive
    val bruteTop = Sim.cosineTopK(df, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = out.count { case (q, c, _) => bruteTop((q, c)) } / 50.0
    assert(recall >= 0.8, s"RP ANN recall out of band: $recall")
  }

  test("randomProjection: norms concentrate (JL), deterministic, components restatable") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.tabulate(300)(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = Sim.randomProjection(vecs, inDim = 64, outDim = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.length === 300)
    // E[ratio^2] = 1 with std ~ sqrt(2/16) ≈ 0.35 -> individual ratios
    // stay in a wide band and the mean concentrates near 1
    assert(out.forall { case (_, pn, on, ratio) => pn > 0 && on > 0 && ratio > 0.3 && ratio < 2.0 },
      "a ratio escaped the JL band")
    val mean = out.map(_._4).sum / out.length
    assert(math.abs(mean - 1.0) < 0.1, s"mean ratio drifted: $mean")
    // deterministic across invocations (literal matrix, no RNG state)
    val again = Sim.randomProjection(vecs, inDim = 64, outDim = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out.toSeq === again.toSeq)
  }
}
