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

  // ---- graft.ops.Sketches: the deterministic, oracle-restatable tier ----

  test("hllDistinct: exact counts ride the register fold; estimates within HLL error") {
    // planted cardinalities per group: 40 / 400 / 1500 distinct keys
    import graft.ops.Sketches
    val rows = Seq(("a", 40), ("b", 400), ("c", 1500)).flatMap { case (g, n) =>
      (0 until n).flatMap(i => Seq((g, s"$g-key-$i"), (g, s"$g-key-$i"))) // dup rows collapse
    }
    val out = Sketches.hllDistinct(rows.toDF("g", "k"), "g", "k")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("a")._1 === 40L && out("b")._1 === 400L && out("c")._1 === 1500L)
    // m=64 standard error is 1.04/sqrt(64) = 13%; allow 3 sigma
    for ((g, (exact, est)) <- out)
      assert(math.abs(est - exact) / exact <= 0.39, s"$g: est $est vs $exact")
  }

  test("cmsHeavyHitters: estimates never undercount and the planted hot key ranks first") {
    import graft.ops.Sketches
    val rows = (1 to 4000).map(i => if (i % 4 == 0) "hot" else s"u${i % 97}")
    val out = Sketches.cmsHeavyHitters(rows.toDF("user_id"), "user_id", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.forall(_._4 >= 0L), "CMS undercounted (overshoot < 0)")
    assert(out.head._1 === "hot" && out.head._5 === 1L)
    assert(out.head._2 === 1000L)
    assert(out.map(_._5).toSeq === (1L to 10L))
  }

  test("bloomDedupFlags: no false negatives, exact flags, planted overlap found") {
    import graft.ops.Sketches
    val hist = (0 until 300).map(i => (i.toLong, s"k${i}")).toDF("event_id", "bk0")
    // batch: 50 repeats of history keys + 50 fresh ones
    val batch = ((1000 until 1050).map(i => (i.toLong, s"k${i - 1000}")) ++
      (1050 until 1100).map(i => (i.toLong, s"fresh$i"))).toDF("event_id", "bk0")
    val out = Sketches.bloomDedupFlags(hist, batch, col("bk0"), "event_id",
        m = Sketches.bloomBits(300))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(out.length === 100)
    // the defining property: seen => maybe_seen (no false negatives)
    assert(out.forall { case (_, maybe, seen, _) => !seen || maybe })
    assert(out.count(_._3) === 50, "planted overlap must be found exactly")
    assert(out.forall { case (_, maybe, seen, fp) => fp === (maybe && !seen) })
  }

  test("hllOverlap: register merge estimates the planted intersection; exact column exact") {
    import graft.ops.Sketches
    // A = keys 0..399, B = keys 200..599 -> overlap exactly 200;
    // C disjoint -> overlap 0 (estimate may read slightly negative —
    // documented inclusion-exclusion behavior)
    val rows = (0 until 400).map(i => ("A", s"key$i")) ++
      (200 until 600).map(i => ("B", s"key$i")) ++
      (1000 until 1200).map(i => ("C", s"key$i"))
    val out = Sketches.hllOverlap(rows.toDF("g", "k"), "g", "k")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("A", "B"))._1 === 200L)
    assert(out(("A", "C"))._1 === 0L && out(("B", "C"))._1 === 0L)
    // inclusion-exclusion compounds three m=64 estimates (13% sigma
    // each) — allow a wide but meaningful band on the planted overlap
    val est = out(("A", "B"))._2
    assert(est > 60 && est < 340, s"overlap estimate out of band: $est")
    assert(math.abs(out(("A", "C"))._2) < 120, "disjoint pair should estimate near zero")
  }

  test("hdrQuantiles: log-linear buckets keep every quantile within the grid's relative error") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(_ => ("g", math.exp(rnd.nextGaussian() * 1.5 + 3)))
    val df = rows.toDF("g", "v")
    val out = Sketches.hdrQuantiles(df, "g", "v", Seq(0.5, 0.9, 0.99)).collect().head
    val vals = rows.map(_._2).sorted
    def exact(q: Double) = vals((q * (vals.size - 1)).toInt)
    for ((q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val est = out.getDouble(2 + i)
      val ex = exact(q)
      // 4-bit mantissa grid: bucket width is 2^(blen-4) <= value/8, so
      // the midpoint is within ~6.7% + one-bucket rank slack
      assert(math.abs(est - ex) / ex <= 0.15, s"p$q: est $est vs exact $ex")
    }
  }
}
