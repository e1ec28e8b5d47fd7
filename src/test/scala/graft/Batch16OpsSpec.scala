package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Batch-16 operator fixtures: corpus-health diagnostics — per-source
  * KL divergence, Zipf rank-frequency fit, and token burstiness.
  */
class Batch16OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- sourceKlDivergence --------------------------------------------------

  test("sourceKlDivergence: a source matching the blend scores ~0; a drifted one scores higher") {
    val docs = Seq(
      (1L, "a b a b", "mixed"),  // same mix as the corpus marginal-ish
      (2L, "a b a b", "mixed2"),
      (3L, "z z z z", "drift"))  // tokens nobody else uses
      .toDF("doc_id", "text", "source")
    val out = Text.sourceKlDivergence(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("kl_r"))).toMap
    assert(out("drift") > out("mixed"),
      s"disjoint-vocabulary source must diverge more: $out")
    assert(out.values.forall(_ >= 0.0), "KL is nonnegative")
  }

  test("sourceKlDivergence: a single-source corpus has KL exactly 0") {
    val docs = Seq((1L, "a b c a"), (2L, "b c a b")).map { case (i, t) => (i, t, "only") }
      .toDF("doc_id", "text", "source")
    val out = Text.sourceKlDivergence(docs).collect().head
    assert(out.getDouble(out.fieldIndex("kl_r")) === 0.0,
      "P_source == P_corpus when there is one source")
  }

  // ---- zipfFit ---------------------------------------------------------------

  test("zipfFit: an exact power law recovers its exponent with r2 = 1") {
    // freq(rank r) = 64 / 2^(r-1): ln f = ln 64 - (ln 2 / ln step) ... build
    // tokens with counts 64, 32, 16, 8 at ranks 1..4 -> slope vs ln(rank)
    // is not exactly linear, so instead pin the generic sanity: slope < 0
    // and r2 in (0, 1]; the EXACT fixture uses freqs f(r) = C * r^-1.5
    val freqs = (1 to 8).map(r => (s"t$r", math.round(1e6 / math.pow(r, 1.5)).toInt))
    val text = freqs.flatMap { case (t, n) => Seq.fill(n / 1000)(t) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = Text.zipfFit(docs).collect().head
    assert(out.getLong(out.fieldIndex("n_vocab")) === 8L)
    val slope = out.getDouble(out.fieldIndex("slope_r"))
    assert(math.abs(slope - (-1.5)) < 0.02, s"slope $slope should recover -1.5")
    assert(out.getDouble(out.fieldIndex("r2_r")) > 0.999)
  }

  test("zipfFit: the scale-path rank (range-partition + offsets) matches " +
      "the window path bit for bit") {
    // r18: past ZipfRankWindowMaxBytes the vocabulary rank must not
    // single-partition (Heaps' law keeps growing); the scale path's
    // global rank = per-partition offset + local rank is exact for the
    // monotone range partitioning, so the fit is identical
    val freqs = (1 to 50).map(r => (s"tok$r", math.max(1, 200 / r)))
    val text = freqs.flatMap { case (t, n) => Seq.fill(n)(t) }.mkString(" ")
    val docs = Seq((1L, text), (2L, text + " extra")).toDF("doc_id", "text")
    val window = Text.zipfFit(docs).collect().head
    Text.testForceScaleZipfRank = true
    try {
      val scaled = Text.zipfFit(docs).collect().head
      assert(scaled.toSeq === window.toSeq,
        "scale-path zipf fit must equal the window-path fit")
    } finally {
      Text.testForceScaleZipfRank = false
      graft.CacheScope.flush()
    }
  }

  // ---- tokenBurstiness -------------------------------------------------------

  test("tokenBurstiness: clumped tokens disperse over 1, even spread sits at mean 1") {
    val docs = Seq(
      (1L, "even topic topic topic topic"),
      (2L, "even"),
      (3L, "even"))
      .toDF("doc_id", "text")
    val out = Text.tokenBurstiness(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("even") === ((3L, 3L, 1.0)), "evenly spread: one per doc")
    assert(out("topic")._1 === 1L && out("topic")._2 === 4L,
      "clumped: all four occurrences in one doc")
    // dispersion of a single containing doc is NULL (var_samp undefined)
    val topicRow = Text.tokenBurstiness(docs).filter("token = 'topic'").collect().head
    assert(topicRow.isNullAt(topicRow.fieldIndex("dispersion_r")))
  }
}
