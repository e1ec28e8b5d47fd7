package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Text}

/** Behavioral pins for the DSIR importance-weight scorer
  * (Text.dsirWeights) — the oracle pins exact values; this pins the
  * operator's semantics on properties that survive fixture changes.
  */
class DsirSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.documents(spark, dir)
  private lazy val weights =
    Text.dsirWeights(docs, col("lang") === "en", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))

  test("every doc with at least one token is scored, with 2n-1 grams") {
    val lens = docs.select(col("doc_id"), size(Dedup.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val scored = weights.map(w => w._1 -> w._3).toMap
    lens.foreach { case (id, n) =>
      val expected = if (n >= 2) 2L * n - 1 else n.toLong
      if (n > 0) assert(scored(id) === expected, s"doc $id")
      else assert(!scored.contains(id))
    }
  }

  test("model-fed scoring (dsirWeightsFrom) is row-identical to in-plan") {
    val inPlan = Text.dsirWeights(docs, col("lang") === "en", buckets = 256)
    val fed = Text.dsirWeightsFrom(docs, col("lang") === "en", buckets = 256,
      ratioRows = EntrySupport.dsirRatioLocal(spark, dir, 256))
    assert(inPlan.collect().map(_.toString).sorted.toSeq ===
      fed.collect().map(_.toString).sorted.toSeq)
  }

  test("dsirWeightsFrom rejects a duplicate-bucket or oversized model") {
    intercept[IllegalArgumentException] {
      Text.dsirWeightsFrom(docs, col("lang") === "en", buckets = 256,
        ratioRows = Seq((1L, 5L), (1L, 7L)))
    }
    intercept[IllegalArgumentException] {
      Text.dsirWeightsFrom(docs, col("lang") === "en", buckets = 2,
        ratioRows = Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    }
  }

  test("target-domain docs average a higher importance weight") {
    val (en, rest) = weights.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._4).sum / en.length
    val restMean = rest.map(_._4).sum / rest.length
    assert(enMean > restMean,
      s"en mean $enMean should exceed non-en mean $restMean")
  }

  test("weights are invariant under corpus row order (exact long sums)") {
    val perm = Text.dsirWeights(
        docs.orderBy(rand(7)), col("lang") === "en", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    weights.foreach { case (id, _, _, w) =>
      assert(perm(id) === w, s"doc $id weight moved under row permutation")
    }
  }

  test("an all-target corpus scores every doc exactly zero") {
    // tgt ≡ corpus ⇒ tc == sc per bucket and t_tot == s_tot ⇒ every
    // per-bucket log-ratio is exactly 0 ⇒ every micro-nat sum is 0
    val all = Text.dsirWeights(docs, lit(true), buckets = 256)
      .collect().map(_.getDouble(3))
    assert(all.nonEmpty && all.forall(_ == 0.0))
  }

  test("an empty-target corpus still yields finite weights") {
    val none = Text.dsirWeights(docs, lit(false), buckets = 256)
      .collect().map(_.getDouble(3))
    assert(none.nonEmpty && none.forall(w => !w.isNaN && !w.isInfinite))
  }

  test("perplexity bands partition all scored docs into near-equal, ordered terciles") {
    val bands = SparkEntry.queries("q_ppl_band")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bands.map(_._1).toSeq === Seq(1L, 2L, 3L))
    val scored = graft.ops.Text.interpolatedLogProbFrom(
      EntrySupport.lmCollapse(spark, dir), 0.7).count()
    assert(bands.map(_._2).sum === scored, "bands must partition every scored doc")
    assert(bands.map(_._2).max - bands.map(_._2).min <= 1, "ntile near-equal sizes")
    // ordered terciles: head band's WORST score is no worse than the
    // next band's BEST (ties can touch, never cross)
    assert(bands(0)._3 >= bands(1)._4 && bands(1)._3 >= bands(2)._4)
  }

  test("the resampling take selects exactly the top-100 by (logw_r, doc_id)") {
    val selected = Text.dsirWeights(docs, col("lang") === "en", buckets = 256)
      .orderBy(col("logw_r").desc, col("doc_id")).limit(100)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val expected = weights.sortBy(w => (-w._4, w._1)).take(100)
      .map(w => (w._1, w._4)).toSeq
    assert(selected.sortBy(_._1) === expected.sortBy(_._1))
  }
}
