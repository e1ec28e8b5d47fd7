package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text
import org.apache.spark.sql.functions._

/** The fused hybrid ranker's defining law: `hybridRrfTopK` must equal
  * `rrfFuse(tfidfCosineTopK, bm25TopK)` ROW FOR ROW — same fused
  * ranks, same scores, same n_lists — including the corner the fusion
  * has to get right: a candidate pair that exists only in the BM25
  * universe (shares only df-capped tokens with the query) must never
  * steal a tf-idf rank.
  */
class HybridRrfSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def fusedVsComposed(docs: org.apache.spark.sql.DataFrame,
                              nQ: Int, kPer: Int, kF: Int, cap: Double): Unit = {
    val fused = Text.hybridRrfTopK(docs, nQ, kPer, kF, cap)
      .orderBy(col("q_id"), col("fused_rnk")).collect().toSeq
    CacheScope.flush()
    val composed = Text.rrfFuse(Seq(
        Text.tfidfCosineTopK(docs, nQ, kPer, cap),
        Text.bm25TopK(docs, nQ, kPer)), c = 60.0, k = kF)
      .orderBy(col("q_id"), col("fused_rnk")).collect().toSeq
    CacheScope.flush()
    assert(fused.map(_.toSeq) === composed.map(_.toSeq))
  }

  test("fused ranking equals the composed three-operator form row for row") {
    // 12 docs over a small vocabulary: shared rare tokens, a universal
    // token the df cap prunes, repeated tokens for tf saturation
    val docs = (0L until 12L).map { i =>
      val rare = s"r${i % 4} r${(i + 1) % 4}"
      val noise = (0 until (i % 3).toInt + 1).map(j => s"n${(i + j) % 5}").mkString(" ")
      (i, s"common $rare $noise common")
    }.toDF("doc_id", "text")
    fusedVsComposed(docs, nQ = 3, kPer = 4, kF = 3, cap = 0.6)
  }

  test("a pair sharing ONLY capped tokens joins the BM25 ranking but never the tf-idf one") {
    // doc 0 (query) and doc 5 share only "common" (df = all docs, far
    // above the cap); docs 1-4 share rare tokens with doc 0. In the
    // fused plan doc 5 flows through the posting join with n_kept = 0
    // — the composed form simply never pairs it lexically.
    val docs = Seq(
      (0L, "common alpha beta"),
      (1L, "common alpha gamma"),
      (2L, "common beta delta"),
      (3L, "common alpha beta"),
      (4L, "common gamma delta"),
      (5L, "common zeta zeta")).toDF("doc_id", "text")
    fusedVsComposed(docs, nQ = 1, kPer = 3, kF = 3, cap = 0.5)
  }
}
