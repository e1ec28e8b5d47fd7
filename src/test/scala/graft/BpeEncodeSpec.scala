package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** The codegen'd sequential-pass BPE encoder (Text.bpeEncodeExpr): for
  * any LEARNED merge list it must agree exactly with the priority-loop
  * reference encoder (Text.bpeApply), including the adjacent-occurrence
  * and self-pair replace corners, and a merge must never cross a word
  * boundary.
  */
class BpeEncodeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def countsAgree(docs: Seq[(Long, String)],
                          merges: Seq[(String, String)]): Unit = {
    val df = docs.toDF("doc_id", "text")
    val expr = Text.bpeEncodeDocs(df, merges)
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    val ref = Text.bpeApply(df, merges)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(expr === ref, s"merges=$merges")
  }

  test("agrees with the priority encoder on a learned merge list") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wider wide widest low"),
      (4L, "a ab aba abab ababab"))
    val merges = Text.bpeTrain(docs.toDF("doc_id", "text"), 10)
    assert(merges.nonEmpty)
    countsAgree(docs, merges)
  }

  test("adjacent occurrences and self-pair runs merge exactly like the reference") {
    // hand-built but derivation-ordered lists (every pair's symbols
    // exist before its rank) — the contract bpeEncodeExpr documents
    val docs = Seq(
      (1L, "ababab abab ab ba"),
      (2L, "aaaa aaa aa a"),
      (3L, "ba abbab bab"))
    countsAgree(docs, Seq(("a", "b")))
    countsAgree(docs, Seq(("a", "a"), ("aa", "aa")))
    countsAgree(docs, Seq(("a", "b"), ("ab", "ab"), ("b", "a")))
  }

  test("learned merges over random corpora: expr == reference, every doc") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val docs = (1L to 40L).map { i =>
        val w = (1 to rnd.nextInt(8) + 1).map { _ =>
          (1 to rnd.nextInt(6) + 1).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        }
        (i, w.mkString(" "))
      }
      val merges = Text.bpeTrain(docs.toDF("doc_id", "text"), 12)
      countsAgree(docs, merges)
    }
  }

  test("merges never cross a word boundary") {
    // every word is a single char; the only adjacent pairs are ACROSS
    // words — however hard we push a crafted pair, counts must stay
    // at one symbol per word
    val docs = Seq((1L, "a b a b a b"))
    val out = Text.bpeEncodeDocs(docs.toDF("doc_id", "text"), Seq(("a", "b")))
      .select("n_words", "n_bpe").as[(Long, Long)].collect().head
    assert(out === ((6L, 6L)))
  }

  test("fertility column and word counts are exact") {
    val out = Text.bpeEncodeDocs(
        Seq((1L, "  aa   bb  "), (2L, " ")).toDF("doc_id", "text"),
        Seq(("a", "a")))
      .select("doc_id", "n_words", "n_bpe", "bpe_per_word_r")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // whitespace-only doc drops; "aa" -> [aa] (1), "bb" -> [b,b] (2)
    assert(out.toSeq === Seq((1L, 2L, 3L, 1.5)))
  }
}
