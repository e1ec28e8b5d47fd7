package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Full ExactSubstr (Lee et al. 2022) — planted-span cases: a shared
  * span lands as ONE maximal interval in both sharers; the trim cuts
  * it from every occurrence except the corpus-first; overlapping gram
  * runs coalesce; self-repetition counts as duplication; short docs
  * and span-free docs surface with zeros, never drop.
  */
class ExactSubstrSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val L = 4

  test("a planted shared span reports one maximal interval in both docs") {
    // docs 1 and 2 share tokens s1..s8 (8 tokens ⇒ positions of 5
    // duplicated 4-grams, one merged span of 8 tokens); surroundings
    // are unique
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val c = corpus(
      1L -> s"a1 a2 a3 $shared a4 a5",
      2L -> s"b1 b2 $shared b3 b4 b5 b6")
    val out = Dedup.exactSubstrSpans(c, L).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ===
      Seq((1L, 1L, 8L, 8L), (2L, 1L, 8L, 8L)))
  }

  test("trim keeps the corpus-first occurrence and cuts the later one") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val c = corpus(
      1L -> s"a1 a2 a3 $shared a4 a5",
      2L -> s"b1 b2 $shared b3 b4 b5 b6")
    val out = Dedup.exactSubstrTrim(c, L).orderBy("doc_id").collect()
    // doc 1 owns the span (earlier doc_id) — text survives verbatim
    assert(out(0).getLong(2) === 13L)
    assert(out(0).getString(3) === s"a1 a2 a3 $shared a4 a5")
    // doc 2 loses exactly the 8 shared tokens
    assert(out(1).getLong(2) === 6L)
    assert(out(1).getString(3) === "b1 b2 b3 b4 b5 b6")
  }

  test("self-repetition inside one doc is a duplicated span; first copy survives trim") {
    val rep = (1 to 4).map(i => s"r$i").mkString(" ")
    val c = corpus(3L -> s"$rep x1 x2 $rep")
    val spans = Dedup.exactSubstrSpans(c, L).collect().head
    // both occurrences' positions are duplicated: spans at [1,4] and [7,10]
    assert(spans.getLong(2) === 2L && spans.getLong(3) === 8L && spans.getLong(4) === 4L)
    val trim = Dedup.exactSubstrTrim(c, L).collect().head
    assert(trim.getLong(2) === 6L)
    assert(trim.getString(3) === s"$rep x1 x2")
  }

  test("overlapping and adjacent duplicated runs coalesce into one interval") {
    // doc 5 repeats doc 4's 10-token prefix: ALL its covering 4-grams
    // duplicate, and the merged interval must be exactly [1,10], not
    // seven length-4 fragments
    val pre = (1 to 10).map(i => s"p$i").mkString(" ")
    val c = corpus(4L -> s"$pre t1 t2", 5L -> s"$pre u1 u2 u3")
    val out = Dedup.exactSubstrSpans(c, L).orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 1L && out(0).getLong(3) === 10L && out(0).getLong(4) === 10L)
    assert(out(1).getLong(2) === 1L && out(1).getLong(3) === 10L)
  }

  test("span-free, shorter-than-L, and ZERO-token docs surface with zeros") {
    // the empty doc is the regression case: a sequence(1, size)-based
    // index walk evaluates the descending [1, 0] range and throws on
    // element_at(t, 0) — the index-carrying transform must not
    val c = corpus(6L -> "q1 q2 q3 q4 q5", 7L -> "w1 w2", 8L -> "")
    val out = Dedup.exactSubstrSpans(c, L).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((6L, 5L, 0L), (7L, 2L, 0L), (8L, 0L, 0L)))
    val trim = Dedup.exactSubstrTrim(c, L).orderBy("doc_id").collect()
    assert(trim.map(_.getString(3)).toSeq === Seq("q1 q2 q3 q4 q5", "w1 w2", ""))
    assert(trim.map(_.getLong(2)).toSeq === Seq(5L, 2L, 0L))
  }

  test("covered_frac and position packing stay exact on a 1500-token doc") {
    // the 2^20 packing bound leaves six orders of magnitude of head-
    // room; a doc well past the old 1000-segment aliasing regression
    // keeps exact first-occurrence attribution
    val big = (1 to 1500).map(i => s"t$i").mkString(" ")
    val c = corpus(8L -> big, 9L -> big)
    val out = Dedup.exactSubstrSpans(c, L).orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === 1500L)
      assert(r.getDouble(5) === 1.0)
    }
    val trim = Dedup.exactSubstrTrim(c, L).orderBy("doc_id").collect()
    assert(trim(0).getLong(2) === 1500L, "owner doc keeps everything")
    assert(trim(1).getLong(2) === 0L && trim(1).getString(3) === "",
      "full-duplicate doc comes back empty, surfaced not dropped")
  }

  test("the L knob at the Lee et al. operating point: a 60-token repeat " +
      "is a span at L=50, a 40-token repeat is not") {
    val long = (1 to 60).map(i => s"r$i").mkString(" ")   // >= 50: cut
    val short = (1 to 40).map(i => s"u$i").mkString(" ")  // < 50: kept
    val c = corpus(
      1L -> s"x1 x2 $long x3",
      2L -> s"y1 $long y2 y3",
      3L -> s"z1 z2 $short z3",
      4L -> s"v1 $short v2 v3")
    val at50 = Dedup.exactSubstrSpans(c, L = 50).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    // the 60-token shared run lands as ONE span of exactly 60 in both
    // sharers; the 40-token run is below the paper's threshold — zeros
    assert(at50(1L) === ((1L, 60L)) && at50(2L) === ((1L, 60L)))
    assert(at50(3L) === ((0L, 0L)) && at50(4L) === ((0L, 0L)))
    // at L=8 BOTH repeats are spans — the knob is the only difference
    val at8 = Dedup.exactSubstrSpans(c, L = 8).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(at8(1L) === 60L && at8(3L) === 40L)
    // trim at L=50: the second occurrence loses exactly the 60 tokens,
    // the 40-token repeat survives everywhere
    val t50 = Dedup.exactSubstrTrim(c, L = 50).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(t50(1L) === 63L, "corpus-first occurrence keeps everything")
    assert(t50(2L) === 3L, "later occurrence loses the 60-token span")
    assert(t50(3L) === 43L && t50(4L) === 43L, "sub-L repeats survive")
  }
}
