package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Hand-computed pins for the text-analysis heuristics, independent of
  * the shared corpus and the oracle.
  */
class LangQualitySpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("languageId scores distinct marker overlap; ties break to the later profile name") {
    // 'the','a' → p_article = 2; 'spark','query' → p_query = 2; tie →
    // greatest(struct) picks the lexicographically larger profile name
    val docs = Seq((0L, "the a spark query", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Text.languageId(docs).collect().head
    assert(r.getLong(1) === 2L) // score_p_article
    assert(r.getLong(2) === 2L) // score_p_query
    assert(r.getLong(3) === 0L) // score_p_stream
    assert(r.getString(4) === "p_query")
  }

  test("qualityScore computes the documented formula exactly") {
    // "the cat": n_tok=2, n_stop=1 ('the'), n_chars=7
    val docs = Seq((0L, "the cat", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Text.qualityScore(docs, Seq("the", "a")).collect().head
    assert(r.getLong(1) === 2L)            // n_tok
    assert(r.getDouble(2) === 3.5)         // avg_tok_len = 7/2
    assert(r.getDouble(3) === 0.5)         // stop_ratio
    assert(r.getDouble(4) === 0.01)        // min(2/100,1) * (1-0.5)
  }

  test("duplicated marker tokens count once (distinct overlap)") {
    val docs = Seq((0L, "the the the the", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Text.languageId(docs).collect().head
    assert(r.getLong(1) === 1L) // 'the' counted once
  }

  test("unigramLogProb: hand-computed corpus distribution") {
    // tf: a=3, b=2, total=5. doc1 [a,a,a,b]: avg(3*ln(0.6)+ln(0.4))/4 =
    // -0.6122; doc2 [b]: ln(0.4) = -0.9163
    val out = Text.unigramLogProb(
      Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) === ((4L, -0.6122)))
    assert(out(2L) === ((1L, -0.9163)))
  }
}
