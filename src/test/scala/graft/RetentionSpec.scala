package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus

/** Retention / GC of the claims-based index store (VERDICT r16 #7):
  * expiring everything last claimed before the horizon must behave
  * EXACTLY as if the expired days were never ingested — the law that
  * makes nightly compaction safe — and re-assertion (a re-crawl of an
  * old key inside the horizon) must keep the key alive.
  */
class RetentionSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def dayClaims(pages: org.apache.spark.sql.DataFrame, d: Long) =
    Corpus.webCorpusIndexClaims(pages.filter(col("doc_id") % 4 === (d - 1L)),
      day = d)

  test("the one-pass day-column form ≡ the per-day form unioned over " +
      "slices — slicing commutes with claiming") {
    val pages = EntrySupport.wcStandingPages(spark, dir)
    val onePass = graft.ops.Corpus.webCorpusIndexClaimsWithDay(
        pages, dayCol = col("doc_id") % 4 + 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val perDay = (1L to 4L).map(dayClaims(pages, _)).reduce(_ unionByName _)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(onePass === perDay)
  }

  test("compact(all history, h) ≡ the same fold over only the retained " +
      "days — expiry ≡ never-ingested") {
    val pages = EntrySupport.wcStandingPages(spark, dir)
    val all = (1L to 4L).map(dayClaims(pages, _)).reduce(_ unionByName _)
    val compacted = Corpus.indexRetentionCompact(all, horizonDay = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val retainedOnly = (3L to 4L).map(dayClaims(pages, _))
      .reduce(_ unionByName _)
      .groupBy(col("kind"), col("key")).agg(max(col("day")).as("last_day"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(compacted === retainedOnly)
    assert(compacted.nonEmpty && compacted.exists(_._1 == "canon") &&
      compacted.exists(_._1 == "text"))
  }

  test("expiry drops dead keys; re-assertion inside the horizon keeps " +
      "old keys alive") {
    val pages = EntrySupport.wcStandingPages(spark, dir)
    val all = (1L to 4L).map(dayClaims(pages, _)).reduce(_ unionByName _)
    val fold = all.groupBy(col("kind"), col("key"))
      .agg(max(col("day")).as("last_day"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val compactKeys = Corpus.indexRetentionCompact(all, horizonDay = 3L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val dead = fold.filter(_._2 < 3L).map(_._1)
    val live = fold.filter(_._2 >= 3L).map(_._1)
    assert(dead.nonEmpty, "fixture must plant keys that die at horizon 3")
    assert(dead.forall(k => !compactKeys.contains(k)),
      "keys last claimed before the horizon must expire")
    assert(live.forall(compactKeys.contains),
      "keys claimed inside the horizon must survive")
    // re-assertion: planted canonical groups have width 3 (targets
    // doc_id/9), so the same canonical is claimed from several day
    // classes — at least one canon key claimed on BOTH an expired day
    // and a retained day must be alive with the retained last_day
    val canonDays = all.filter(col("kind") === "canon")
      .groupBy(col("key"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .filter(col("d0") < 3 && col("d1") >= 3)
      .collect()
    assert(canonDays.nonEmpty,
      "fixture must plant a canonical claimed both before and inside " +
        "the horizon")
    assert(canonDays.forall(r =>
      compactKeys.contains(("canon", r.getString(0)))),
      "a re-asserted key must stay alive")
  }
}
