package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, EventOps, Relational}

/** Batch-10 operator fixtures: per-group OLS trend, Markov transition
  * matrix, co-occurrence lift, MAD outliers, key-skew profile,
  * source/sink reconciliation, trailing EWMA, length-percentile band,
  * winsorization, and boilerplate detection — each pinned by a
  * hand-computed example including its edge cases (perfect fit,
  * conditional-probability normalization, one-sided loss, boundary
  * clipping, sub-segment docs).
  */
class Batch10OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- trendPerGroup -------------------------------------------------------

  test("trendPerGroup: exact line recovers slope/intercept with r2=1") {
    // y = 3x + 2 exactly; one noisy group alongside
    val df = Seq(
      ("a", 0.0, 2.0), ("a", 1.0, 5.0), ("a", 2.0, 8.0),
      ("b", 0.0, 0.0), ("b", 1.0, 10.0), ("b", 2.0, 0.0))
      .toDF("g", "x", "y")
    val out = Relational.trendPerGroup(df, "g", "x", "y")
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(a.fieldIndex("n")) === 3L)
    assert(a.getDouble(a.fieldIndex("slope_r")) === 3.0)
    assert(a.getDouble(a.fieldIndex("intercept_r")) === 2.0)
    assert(a.getDouble(a.fieldIndex("r2_r")) === 1.0)
    val b = out(1)
    assert(b.getDouble(b.fieldIndex("slope_r")) === 0.0) // symmetric spike: no trend
  }

  // ---- transitionMatrix ----------------------------------------------------

  test("transitionMatrix: conditional probabilities normalize per source state") {
    // user 1: a->b->a->c   user 2: a->b
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"), (1L, 4L, 40L, "c"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "b"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val out = EventOps.transitionMatrix(ev, "ts_us", "event_type")
      .orderBy("state", "next_state")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // a->b twice, a->c once (P(b|a)=2/3), b->a once
    assert(out === Array(
      ("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333), ("b", "a", 1L, 1.0)))
  }

  // ---- cooccurrence --------------------------------------------------------

  test("cooccurrence: lift is containment-normalized, pairs unordered") {
    // 3 containers: {a,b}, {a,b}, {a}  => n_a=3, n_b=2, n_ab=2, n_c=3
    // lift = 2*3/(3*2) = 1.0
    val ev = Seq(
      (1L, "d1", "a"), (1L, "d1", "b"),
      (2L, "d1", "a"), (2L, "d1", "b"), (2L, "d1", "b"), // dup pair collapses
      (3L, "d1", "a"))
      .toDF("user_id", "day", "event_type")
    val out = EventOps.cooccurrence(ev, Seq(col("user_id"), col("day")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out === Array(("a", "b", 2L, 1.0)))
  }

  // ---- madOutliers ---------------------------------------------------------

  test("madOutliers: spike flagged, bulk not, direction signed") {
    val vals = Seq.tabulate(9)(i => ("g", 10.0 + i)) :+ (("g", 1000.0))
    val df = vals.toDF("g", "v")
    val out = Relational.madOutliers(df, "g", "v", 3.0).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(out.head.fieldIndex("v")) === 1000.0)
    assert(out.head.getDouble(out.head.fieldIndex("robust_z")) > 3.0)
  }

  test("madOutliers: NULL group keys drop (the equi-join contract), not form their own group") {
    // the pre-window form equi-joined group stats back onto the facts,
    // so NULL-keyed rows never matched; the window rewrite must keep
    // that contract rather than give NULL its own partition
    val vals: Seq[(Option[String], Double)] =
      Seq.tabulate(9)(i => (Some("g"), 10.0 + i)) ++
        Seq((Some("g"), 1000.0), (None, 5.0), (None, 5000.0))
    val df = vals.toDF("g", "v")
    val out = Relational.madOutliers(df, "g", "v", 3.0).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(out.head.fieldIndex("v")) === 1000.0)
  }

  // ---- keySkewProfile ------------------------------------------------------

  test("keySkewProfile: hot key shows its multiple of the mean") {
    // key 1: 8 rows, keys 2..5: 1 row each => total 12, 5 keys, mean 2.4
    val df = (Seq.fill(8)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val out = Relational.keySkewProfile(df, "k", 3).collect()
    assert(out.length === 3)
    assert(out.head.getLong(0) === 1L)
    assert(out.head.getLong(out.head.fieldIndex("n")) === 8L)
    // 8 / (12/5) = 3.3333
    assert(out.head.getDouble(out.head.fieldIndex("x_avg_r")) === 3.3333)
  }

  // ---- reconcile -----------------------------------------------------------

  test("reconcile: per-day deltas, days missing on either side zero-filled") {
    val us = (d: Int) => (1704844800L + d * 86400L) * 1000000L // 2024-01-10 + d
    val src = Seq((1L, us(0), 1.0), (2L, us(0), 2.0), (3L, us(1), 3.0))
      .toDF("event_id", "ts_us", "value")
    val dst = Seq((1L, us(0), 1.0), (9L, us(2), 9.0))
      .toDF("event_id", "ts_us", "value")
    val out = EventOps.reconcile(src, dst, "ts_us").orderBy("day")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      ("2024-01-10", 2L, 1L, 1L),
      ("2024-01-11", 1L, 0L, 1L),
      ("2024-01-12", 0L, 1L, -1L)))
  }

  // ---- ewma ----------------------------------------------------------------

  test("ewma: first row is itself; weights halve per step back") {
    val df = Seq((1L, 1L, 10L, 4.0), (1L, 2L, 20L, 0.0), (1L, 3L, 30L, 8.0))
      .toDF("user_id", "event_id", "ts_us", "v")
    val out = Relational.ewma(df, "user_id", "ts_us", "event_id", "v",
        alpha = 0.5, frame = 8)
      .orderBy("event_id")
      .collect().map(r => r.getDouble(r.fieldIndex("ewma_r")))
    // r1: 4; r2: (0 + .5*4)/(1.5) = 1.3333; r3: (8 + .5*0 + .25*4)/1.75 = 5.1429
    assert(out === Array(4.0, 1.3333, 5.1429))
  }

  // ---- lengthBand ----------------------------------------------------------

  test("lengthBand: extremes rejected, middle kept, per-group ranking") {
    val docs = (1L to 11L).map(i => (i, "en", i * 10L)).toDF("doc_id", "g", "len")
    val out = Corpus.lengthBand(docs, "g", "len", 0.05, 0.95)
      .orderBy("doc_id").collect()
    // percent_rank over 11 rows = (rank-1)/10: doc 1 -> 0.0 (reject),
    // doc 11 -> 1.0 (reject), doc 6 -> 0.5 (keep)
    assert(!out(0).getBoolean(out(0).fieldIndex("keep")))
    assert(out(5).getBoolean(out(5).fieldIndex("keep")))
    assert(!out(10).getBoolean(out(10).fieldIndex("keep")))
  }

  // ---- winsorize -----------------------------------------------------------

  test("winsorize: values clip to the percentile band, interior unchanged") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = Corpus.winsorize(df, "g", "v", 0.05, 0.95)
      .orderBy("v").collect()
    // p05 of 1..100 (interpolated) = 5.95, p95 = 95.05
    assert(out.head.getDouble(out.head.fieldIndex("clipped_r")) === 5.95)
    assert(out.last.getDouble(out.last.fieldIndex("clipped_r")) === 95.05)
    val mid = out(49)
    assert(mid.getDouble(mid.fieldIndex("clipped_r")) === mid.getDouble(mid.fieldIndex("v")))
  }

  // ---- boilerplate ---------------------------------------------------------

  test("boilerplate: shared banner flagged, unique body not, short docs drop") {
    val banner = "one two three four five"
    val docs = Seq(
      (1L, s"$banner alpha beta gamma delta eps"),
      (2L, s"$banner zeta eta theta iota kappa"),
      (3L, "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (4L, "tiny doc")) // < 5 tokens => no segments
      .toDF("doc_id", "text")
    val out = Corpus.boilerplate(docs, segLen = 5, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val d1 = out(0)
    assert(d1.getLong(d1.fieldIndex("n_segs")) === 2L)
    assert(d1.getLong(d1.fieldIndex("n_boiler")) === 1L)
    assert(d1.getDouble(d1.fieldIndex("boiler_frac_r")) === 0.5)
    val d3 = out(2)
    assert(d3.getLong(d3.fieldIndex("n_boiler")) === 0L)
  }
}
