package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Segment-level language ID + run collapse (the CCNet per-paragraph
  * LID shape): planted window-split/run-break/collapse cases plus the
  * tiling laws every output must satisfy.
  */
class LangSegmentsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def segs(w: Int, docs: (Long, String)*) =
    Text.langSegments(docs.toSeq.toDF("doc_id", "text"), w)
      .orderBy(col("doc_id"), col("seg_start"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("two marker halves split at the window boundary; same-language " +
      "windows collapse into one segment") {
    val out = segs(8,
      (1L, "the a order key the key order a spark query table row spark row table query"),
      (3L, "batch stream window merge merge window stream batch " +
        "batch batch stream stream window window merge merge"))
    assert(out.filter(_._1 == 1L).toSeq === Seq(
      (1L, "p_article", 0L, 0L, 1L), (1L, "p_query", 1L, 1L, 1L)))
    assert(out.filter(_._1 == 3L).toSeq === Seq(
      (3L, "p_stream", 0L, 1L, 2L)))
  }

  test("a run break yields separate segments for the SAME language") {
    val out = segs(8, (2L,
      "the a order key order the key a " +
        "batch stream window merge stream batch merge window " +
        "the key a order a the order key"))
    assert(out.toSeq === Seq(
      (2L, "p_article", 0L, 0L, 1L),
      (2L, "p_stream", 1L, 1L, 1L),
      (2L, "p_article", 2L, 2L, 1L)))
  }

  test("tiling laws on corpus docs: segments cover every window exactly " +
      "once, never abut a same-language neighbor, and sum to the doc's " +
      "window count") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(60)
    val byDoc = Text.langSegments(docs, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    val expected = docs.select(col("doc_id"),
        (((size(graft.ops.Dedup.tokens(col("text"))) - 1) / 8) + 1).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._3)
      // contiguous tiling from 0, length = seg span, total = window count
      assert(sorted.head._3 === 0L, s"doc $id does not start at window 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._4 + 1, s"doc $id gap/overlap at ${b._3}")
          assert(b._2 !== a._2, s"doc $id adjacent same-language segments")
        case _ =>
      }
      assert(sorted.map(_._5).sum === expected(id), s"doc $id window count")
      sorted.foreach { s => assert(s._5 === s._4 - s._3 + 1) }
    }
  }

  test("width is validated; empty and token-less docs emit nothing") {
    intercept[IllegalArgumentException] { segs(0, (1L, "x")) }
    assert(segs(4).isEmpty)
    assert(segs(4, (1L, " ")).isEmpty)
  }
}
