package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text
import org.apache.spark.sql.functions._

/** The posting store's defining law: every `*From` retrieval operator
  * over [[Text.postingStoreFrame]] must equal its raw-corpus parent
  * ROW FOR ROW — the store only moves the tokenize → collapse →
  * weight chain to ingest, never changes a score, a rank, or a tie.
  * Exercised on the HybridRrfSpec fixtures (shared rare tokens, a
  * df-capped universal token, tf-saturation repeats) including the
  * capped-token corner, and through a real parquet round trip (the
  * store is served from disk in production).
  */
class PostingStoreSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = (0L until 12L).map { i =>
    val rare = s"r${i % 4} r${(i + 1) % 4}"
    val noise = (0 until (i % 3).toInt + 1).map(j => s"n${(i + j) % 5}").mkString(" ")
    (i, s"common $rare $noise common")
  }.toDF("doc_id", "text")

  private val cap = 0.6

  private def rows(df: org.apache.spark.sql.DataFrame, order: Seq[String]) = {
    CacheScope.flush()
    df.orderBy(order.map(col): _*).collect().toSeq.map(_.toSeq)
  }

  test("tfidfTopTermsFrom(store) equals tfidfTopTerms(docs) row for row") {
    val store = Text.postingStoreFrame(docs, cap)
    assert(rows(Text.tfidfTopTermsFrom(store, k = 3), Seq("doc_id", "rnk")) ===
      rows(Text.tfidfTopTerms(docs, k = 3), Seq("doc_id", "rnk")))
  }

  test("tfidfCosineTopKFrom(store) equals tfidfCosineTopK(docs) row for row") {
    val store = Text.postingStoreFrame(docs, cap)
    assert(rows(Text.tfidfCosineTopKFrom(store, nQueries = 3, k = 4), Seq("q_id", "rnk")) ===
      rows(Text.tfidfCosineTopK(docs, nQueries = 3, k = 4, dfCapFrac = cap), Seq("q_id", "rnk")))
  }

  test("bm25TopKFrom(store) equals bm25TopK(docs) row for row") {
    val store = Text.postingStoreFrame(docs, cap)
    assert(rows(Text.bm25TopKFrom(store, nQueries = 3, k = 4), Seq("q_id", "rnk")) ===
      rows(Text.bm25TopK(docs, nQueries = 3, k = 4), Seq("q_id", "rnk")))
  }

  test("hybridRrfTopKFrom(store) equals hybridRrfTopK(docs), capped-only corner included") {
    // doc 0 (query) and doc 5 share ONLY the df-capped token: the
    // store form must keep it in the BM25 universe with n_kept = 0 and
    // never let it steal a cosine rank — the same corner HybridRrfSpec
    // pins on the raw form
    val corner = Seq(
      (0L, "common alpha beta"),
      (1L, "common alpha gamma"),
      (2L, "common beta delta"),
      (3L, "common alpha beta"),
      (4L, "common gamma delta"),
      (5L, "common zeta zeta")).toDF("doc_id", "text")
    for ((d, c) <- Seq((docs, cap), (corner, 0.5))) {
      val store = Text.postingStoreFrame(d, c)
      assert(rows(Text.hybridRrfTopKFrom(store, nQueries = 2, kPer = 3, kFused = 3),
          Seq("q_id", "fused_rnk")) ===
        rows(Text.hybridRrfTopK(d, nQueries = 2, kPer = 3, kFused = 3, dfCapFrac = c),
          Seq("q_id", "fused_rnk")))
    }
  }

  test("driver-local query slices leave every *From operator bit-identical") {
    // the r12 LocalRelation move: collect docs 0..nQ-1's postings
    // (q_id, token, qw) driver-side and pass them as qSlice — scores,
    // ranks, ties, and the capped-token NULL qw must all survive
    val store = Text.postingStoreFrame(docs, cap)
    def slice(nQ: Int) = {
      val rs = store.filter(col("doc_id") < nQ)
        .select(col("doc_id"), col("token"), col("wn"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
      rs.toDF("q_id", "token", "qw")
    }
    assert(rows(Text.tfidfCosineTopKFrom(store, nQueries = 3, k = 4,
        qSlice = Some(slice(3))), Seq("q_id", "rnk")) ===
      rows(Text.tfidfCosineTopKFrom(store, nQueries = 3, k = 4), Seq("q_id", "rnk")))
    assert(rows(Text.bm25TopKFrom(store, nQueries = 3, k = 4,
        qSlice = Some(slice(3))), Seq("q_id", "rnk")) ===
      rows(Text.bm25TopKFrom(store, nQueries = 3, k = 4), Seq("q_id", "rnk")))
    assert(rows(Text.hybridRrfTopKFrom(store, nQueries = 2, kPer = 3, kFused = 3,
        qSlice = Some(slice(2))), Seq("q_id", "fused_rnk")) ===
      rows(Text.hybridRrfTopKFrom(store, nQueries = 2, kPer = 3, kFused = 3),
        Seq("q_id", "fused_rnk")))
  }

  test("the law holds through a parquet round trip of the store") {
    val dir = java.nio.file.Files.createTempDirectory("posting_store_spec").toString
    Text.postingStoreFrame(docs, cap).write.mode("overwrite").parquet(dir)
    val store = spark.read.parquet(dir)
    assert(rows(Text.bm25TopKFrom(store, nQueries = 3, k = 4), Seq("q_id", "rnk")) ===
      rows(Text.bm25TopK(docs, nQueries = 3, k = 4), Seq("q_id", "rnk")))
    assert(rows(Text.hybridRrfTopKFrom(store, nQueries = 2, kPer = 3, kFused = 3),
        Seq("q_id", "fused_rnk")) ===
      rows(Text.hybridRrfTopK(docs, nQueries = 2, kPer = 3, kFused = 3, dfCapFrac = cap),
        Seq("q_id", "fused_rnk")))
  }
}
