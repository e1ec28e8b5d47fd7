package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Full BPE training laws: known merge sequences on constructed
  * corpora, agreement with bpePairCounts at iteration zero, and the
  * train→apply loop's compression contract on the real corpus.
  */
class BpeTrainSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("learns the classic merge sequence on a constructed corpus") {
    // "abab" x3: pairs (a,b)x2·3=6, (b,a)x1·3=3 → merge 1 = (a,b).
    // After it: words are [ab, ab] → merge 2 = (ab, ab).
    val docs = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val merges = Text.bpeTrain(docs, 5)
    assert(merges.take(2) === Seq(("a", "b"), ("ab", "ab")))
    // after (abab) nothing repeats twice → training stops early
    assert(merges.size === 2)
  }

  test("first merge equals bpePairCounts' top pair on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val top = Text.bpePairCounts(docs, 1).collect().head.getString(0)
    val first = Text.bpeTrain(docs, 1).head
    assert(first._1 + first._2 === top.replace(" ", ""),
      s"trainer iteration 0 ($first) disagrees with bpePairCounts ($top)")
  }

  test("tie-break is deterministic: equal counts resolve lexicographically") {
    // (a,b) and (c,d) both appear exactly twice; (a,b) must win
    val docs = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    assert(Text.bpeTrain(docs, 1) === Seq(("a", "b")))
  }

  test("train then apply compresses: token count shrinks monotonically with merges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100).select(col("doc_id"), col("text"))
    def totalTokens(n: Int): Long = {
      val merges = Text.bpeTrain(docs, n)
      Text.bpeApply(docs, merges).agg(sum(col("n_tokens"))).collect().head.getLong(0)
    }
    val t0 = totalTokens(0)
    val t10 = totalTokens(10)
    val t40 = totalTokens(40)
    assert(t0 > t10 && t10 > t40,
      s"more merges must shrink the corpus: $t0 -> $t10 -> $t40")
  }

  test("minWordCount prunes hapax words from the merge statistics") {
    // "xy" appears once; with minWordCount=2 only "ab ab" counts
    val docs = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    assert(Text.bpeTrain(docs, 3, minWordCount = 2L) === Seq(("a", "b")))
    // at the default, (x,y) still can't win (count 1 < 2 repeat floor)
    assert(Text.bpeTrain(docs, 3) === Seq(("a", "b")))
  }

  test("training is reproducible run-to-run") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).select(col("doc_id"), col("text"))
    assert(Text.bpeTrain(docs, 12) === Text.bpeTrain(docs, 12))
  }
}
