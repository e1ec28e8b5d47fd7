package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** The codegen'd sequential-pass BPE encoder (Text.bpeEncodeExpr): for
  * any LEARNED merge list it must agree with the priority-loop
  * reference encoder (Text.bpeApply) — token SEQUENCES, not just
  * counts (every merge shrinks the count by exactly 1, so a
  * positionally wrong encoder would pass a count-only gate) —
  * including the adjacent-occurrence, self-pair, and line-terminator
  * corners, and a merge must never cross a word boundary.
  */
class BpeEncodeSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Token sequence from the encoded representation: split on the
    * double-space separator, drop the U+0001 word-boundary symbols.
    */
  private def seqsAgree(docs: Seq[(Long, String)],
                        merges: Seq[(String, String)]): Unit = {
    val df = docs.toDF("doc_id", "text")
    val enc = df.select(col("doc_id"),
        trim(Text.bpeEncodeExpr(col("text"), merges)).as("e"))
      .as[(Long, String)].collect().toMap
      .map { case (k, e) =>
        k -> (if (e.isEmpty) Seq.empty[String]
              else e.split("  ").toSeq.filter(_ != "\u0001"))
      }
    val ref = Text.bpeApply(df, merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    assert(enc === ref, s"merges=$merges")
  }

  test("agrees with the priority encoder on a learned merge list") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "wider wide widest low"),
      (4L, "a ab aba abab ababab"))
    val merges = Text.bpeTrain(docs.toDF("doc_id", "text"), 10)
    assert(merges.nonEmpty)
    seqsAgree(docs, merges)
  }

  test("adjacent occurrences and self-pair runs merge exactly like the reference") {
    // hand-built but derivation-ordered lists (every pair's symbols
    // exist before its rank) — the contract bpeEncodeExpr documents
    val docs = Seq(
      (1L, "ababab abab ab ba"),
      (2L, "aaaa aaa aa a"),
      (3L, "ba abbab bab"))
    seqsAgree(docs, Seq(("a", "b")))
    seqsAgree(docs, Seq(("a", "a"), ("aa", "aa")))
    seqsAgree(docs, Seq(("a", "b"), ("ab", "ab"), ("b", "a")))
  }

  test("line terminators inside tokens are symbols like any other char") {
    // tokens split on SPACE only, so \n \r \t live inside tokens; the
    // (?s) wrap must cover them on pain of silent symbol loss (and a
    // Java-vs-RE2 '.'-semantics split between engine and oracle)
    val docs = Seq(
      (1L, "a\nb ab a\rb a\tb"),
      (2L, "\na \rb b\n"))
    seqsAgree(docs, Seq.empty)
    seqsAgree(docs, Seq(("a", "b")))
    val merges = Text.bpeTrain(docs.toDF("doc_id", "text"), 6)
    seqsAgree(docs, merges)
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
      seqsAgree(docs, merges)
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

  test("per-lang fertility aggregates the per-doc encode exactly") {
    val docs = Seq(
      (1L, "en", "aa aa bb"), (2L, "en", "aa"),
      (3L, "zz", "bb bb"), (4L, "zz", " "))
      .toDF("doc_id", "lang", "text")
    val out = Text.bpeFertilityByLang(docs, Seq(("a", "a")))
      .select("lang", "n_docs", "n_words", "n_bpe", "fertility_r")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    // en: doc1 "aa aa bb" -> [aa][aa][b,b] = 4 bpe / 3 words; doc2 1/1
    // zz: doc3 [b,b][b,b] = 4 bpe / 2 words; whitespace doc4 drops
    assert(out.toSeq === Seq(
      ("en", 2L, 4L, 5L, 1.25), ("zz", 1L, 2L, 4L, 2.0)))
    // the aggregate is exactly the per-doc encode folded by lang
    val perDoc = Text.bpeEncodeDocs(
        docs.select(col("doc_id"), col("text")), Seq(("a", "a")))
      .select("doc_id", "n_bpe").as[(Long, Long)].collect().toMap
    assert(out.find(_._1 == "en").get._4 === perDoc(1L) + perDoc(2L))
  }
}
