package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Text

/** Majority-of-signals quality ensemble laws: strict median votes,
  * the at-the-median neutrality, and range/coverage invariants.
  */
class QualityVotesSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: (Long, String)*) =
    Text.qualityVotes(docs.toSeq.toDF("doc_id", "text"), Seq("the", "a"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(5), r.getLong(6))).toMap

  test("identical docs sit AT every median and cast zero votes") {
    val t = "the quick brown fox jumps over a lazy dog today"
    val out = run((1L, t), (2L, t), (3L, t))
    assert(out.values.forall(_ == ((0L, 0L))),
      s"at-the-median docs must vote 0 / keep 0, got $out")
  }

  test("a strictly better doc on all four signals wins every vote") {
    // doc 1: long, diverse, stopword-bearing, repetition-free;
    // doc 2 and 3: short, repetitive, stopword-free
    val good = (1 to 30).map(i => if (i % 7 == 0) "the" else s"w$i").mkString(" ")
    val out = run((1L, good), (2L, "spam spam spam spam"), (3L, "buy buy buy"))
    assert(out(1L) === ((4L, 1L)), s"good doc must take all 4 votes: $out")
    assert(out(2L)._2 === 0L && out(3L)._2 === 0L)
  }

  test("frozen-median form ≡ in-plan form when the model comes from the " +
      "same corpus; streamed ≡ batch under the frozen model") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(80)
    val meds = Text.qualityVotesMedians(docs, Seq("the", "a"))
    val inPlan = Text.qualityVotes(docs, Seq("the", "a"))
      .collect().map(_.toString).sorted.toSeq
    val frozen = Text.qualityVotesFrom(docs, Seq("the", "a"), meds)
      .collect().map(_.toString).sorted.toSeq
    assert(frozen === inPlan)
    // streamed twin: two micro-batches, frozen model, same verdicts
    val base = Files.createTempDirectory("graft-qvotes").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$base/src")
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$base/src")
    graft.streaming.StreamingCorpus.qualityVotesStream(
      spark, s"$base/src", schema, s"$base/ckpt", s"$base/sink",
      Seq("the", "a"), meds).awaitTermination()
    val streamed = spark.read.parquet(s"$base/sink")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === frozen)
  }

  test("approx-percentile thresholds: each sits within the documented " +
      "rank-error bound of the true median; empty corpus raises loudly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val acc = 10000
    val approx = Text.qualityVotesMediansApprox(docs, Seq("the", "a"), acc)
    // recover the per-doc signals from the frozen-model scorer's own
    // output columns (one definition of the signal pass — no drift)
    val rows = Text.qualityVotesFrom(docs, Seq("the", "a"), approx).collect()
    val n = rows.length
    val err = n.toDouble / acc + 1.0 // rank error + interpolation slack
    val signals: Seq[(String, Array[Double], Double)] = Seq(
      ("n_toks", rows.map(_.getLong(1).toDouble), approx._1),
      ("ttr", rows.map(_.getDouble(2)), approx._2),
      ("stop_ratio", rows.map(_.getDouble(3)), approx._3),
      ("dup_frac", rows.map(_.getDouble(4)), approx._4))
    signals.foreach { case (name, xs, t) =>
      val below = xs.count(_ < t).toDouble
      val atOrBelow = xs.count(_ <= t).toDouble
      assert(below <= n / 2.0 + err && atOrBelow >= n / 2.0 - err,
        s"$name: approx median $t has rank window [$below, $atOrBelow] " +
          s"outside N/2 ± $err of n=$n")
      // the threshold is an actual element (GK summaries return
      // observed values), so the gate's strict votes stay exact
      assert(xs.contains(t), s"$name: approx median $t not an observed value")
    }
    // memoized model slice ≡ a fresh training call (the dsirRatioLocal
    // parity discipline for driver-local frozen models)
    assert(EntrySupport.qvApproxLocal(spark, "/root/testdata/sf0.001") ===
      Text.qualityVotesMediansApprox(
        Tables.documents(spark, "/root/testdata/sf0.001")
          .select(col("doc_id"), col("text"))
          .repartition(spark.sparkContext.defaultParallelism),
        Seq("the", "a")))
    val e = intercept[IllegalArgumentException] {
      import spark.implicits._
      Text.qualityVotesMediansApprox(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), Seq("the"))
    }
    assert(e.getMessage.contains("no tokened documents"))
  }

  test("corpus invariants: every tokened doc emitted, votes in [0,4], " +
      "keep ≡ votes >= 3, signals are valid ratios") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val rows = Text.qualityVotes(docs, Seq("the", "a")).collect()
    assert(rows.length === docs.filter(
      size(graft.ops.Dedup.tokens(col("text"))) >= 1).count())
    rows.foreach { r =>
      val (ttr, stop, dup) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val (votes, keep) = (r.getLong(5), r.getLong(6))
      assert(votes >= 0L && votes <= 4L)
      assert(keep === (if (votes >= 3L) 1L else 0L))
      assert(ttr > 0.0 && ttr <= 1.0 && stop >= 0.0 && stop <= 1.0 &&
        dup >= 0.0 && dup < 1.0)
    }
    // the median split is real: both sides populated
    assert(rows.exists(_.getLong(5) >= 3L) && rows.exists(_.getLong(5) <= 1L))
  }
}
