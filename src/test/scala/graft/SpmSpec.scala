package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Laws for the unigram-LM (SentencePiece-style) tokenizer — training
  * (spmTrainLocal), the reference Viterbi (spmViterbiLocal), and the
  * column-expression DP (spmSegmentFrame). The oracle pins exact
  * values under the trained model; this pins the SEMANTICS: the
  * λ-degeneracy law, Viterbi global optimality over greedy, the UNK
  * fallback, and expression ≡ reference parity.
  */
class SpmSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("λ-degeneracy: an unconstrained vocabulary collapses to whole words") {
    // every substring is unique to its word, all words equally
    // frequent — the ML unigram solution is the whole-word vocabulary
    // (Kudo 2018 §3.2's degenerate limit), so fertility must be 1
    val words = Seq("abcd", "efgh", "ijkl", "mnop")
    val docs = (0L until 12L).map(i => (i, words(i.toInt % 4)))
      .toDF("doc_id", "text")
    val model = Text.spmTrainLocal(docs, vocabSize = 1000, maxPieceLen = 4,
      emIters = 3, minWordCount = 1L)
    words.foreach { w =>
      assert(Text.spmViterbiLocal(w, model.toMap, 4) === List(w),
        s"word $w did not degenerate to a whole-word piece")
    }
    val enc = Text.spmEncodeDocs(docs, model, maxPieceLen = 4).collect()
    assert(enc.forall(r => r.getAs[Double]("spm_per_word") === 1.0))
  }

  test("Viterbi is globally optimal where greedy longest-match is not") {
    // greedy eats 'ab' (600) then 'c' (600) = 1200; Viterbi takes
    // 'a' + 'bc' = 200
    val model = Map("ab" -> 600L, "a" -> 100L, "bc" -> 100L,
      "b" -> 600L, "c" -> 600L)
    assert(Text.spmViterbiLocal("abc", model, 4) === List("a", "bc"))
  }

  test("deterministic tiebreak: equal cost prefers fewer, longer pieces") {
    // 'aa' (200) ties a+a (100+100): fewer pieces wins
    val model = Map("aa" -> 200L, "a" -> 100L)
    assert(Text.spmViterbiLocal("aa", model, 4) === List("aa"))
  }

  test("UNK fallback: unseen chars segment as single pieces at UNK cost") {
    val model = Map("a" -> 100L)
    assert(Text.spmViterbiLocal("a~a", model, 4) === List("a", "~", "a"))
    val docs = Seq((1L, "a~a")).toDF("doc_id", "text")
    val r = Text.spmEncodeDocs(docs, model.toSeq, 4).collect().head
    assert(r.getAs[Long]("n_spm") === 3L)
    assert(r.getAs[Long]("cost_u6") === 200L + Text.SpmUnkCostU6)
  }

  test("byte-fallback laws: every string encodes with UNK rate 0; n_fb " +
      "prices UTF-8 bytes; ASCII in-vocab text pays none; column DP ≡ " +
      "reference counts in BOTH modes incl. non-BMP") {
    val model = Map("a" -> 100L, "b" -> 120L, "ab" -> 90L)
    // words covering: in-vocab ASCII, unseen ASCII, 2-byte accent,
    // 3-byte CJK, 4-byte NON-BMP (surrogate pair in Java, one code
    // point to Spark/DuckDB), and a mix
    val words = Seq("ab", "a~b", "café", "東京", "a🎼b", "🎼")
    val df = words.map(Tuple1(_)).toDF("word")
    for (fb <- Seq(true, false)) {
      val got = Text.spmSegmentFrame(df, model.toSeq, 4, byteFallback = fb)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      words.foreach { w =>
        val ref = Text.spmViterbiLocalCounts(w, model, 4, byteFallback = fb)
        assert(got(w) === ref, s"fb=$fb diverged on '$w'")
      }
    }
    val fbOn = Text.spmSegmentFrame(df, model.toSeq, 4, byteFallback = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // in-vocab ASCII pays no fallback
    assert(fbOn("ab") === ((1L, 90L, 0L)))
    // a fully-unseen 4-byte code point = 4 byte-pieces, 4×SpmByteCostU6,
    // and NO 25-nat UNK anywhere (UNK rate 0 law)
    assert(fbOn("🎼") === ((4L, 4L * Text.SpmByteCostU6, 4L)))
    assert(fbOn("東京") === ((6L, 6L * Text.SpmByteCostU6, 6L)))
    // fallback OFF prices the same unseen char as ONE UNK piece
    val fbOff = Text.spmSegmentFrame(df, model.toSeq, 4, byteFallback = false)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fbOff("🎼") === ((1L, Text.SpmUnkCostU6, 1L)))
    assert(fbOff("a~b") === ((3L, 220L + Text.SpmUnkCostU6, 1L)))
  }

  test("column-expression DP ≡ reference Viterbi on every corpus word") {
    val dir = "/root/testdata/sf0.001"
    val model = EntrySupport.spmModel(spark, dir)
    val mm = model.toMap
    val words = Tables.documents(spark, dir)
      .select(explode(graft.ops.Dedup.tokens(col("text"))).as("word"))
      .distinct()
    val fromExpr = Text.spmSegmentFrame(words, model, 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    fromExpr.foreach { case (w, (wn, wc)) =>
      val ref = Text.spmViterbiLocal(w, mm, 4)
      val refCost = ref.map(p => mm.getOrElse(p, Text.SpmUnkCostU6)).sum
      assert(wn === ref.size.toLong, s"piece count diverged on '$w'")
      assert(wc === refCost, s"cost diverged on '$w'")
    }
    assert(fromExpr.nonEmpty)
  }

  test("coverage: every single char survives training; model is capped") {
    val docs = Seq((1L, "aaa bbb ab"), (2L, "aaa ccc ab")).toDF("doc_id", "text")
    val model = Text.spmTrainLocal(docs, vocabSize = 5, maxPieceLen = 3,
      emIters = 2, minWordCount = 1L)
    val pieces = model.map(_._1).toSet
    assert(Set("a", "b", "c").subsetOf(pieces))
    assert(model.size <= 5)
  }

  test("fertility: trained model beats the character baseline per language") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).select(col("lang"), col("text"))
    val model = EntrySupport.spmModel(spark, dir)
    val spm = Text.spmFertilityByLang(docs, model, 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("fertility")).toMap
    // char baseline: pieces-per-word if every char were its own piece
    val charBase = docs
      .select(col("lang"), explode(graft.ops.Dedup.tokens(col("text"))).as("w"))
      .groupBy("lang").agg((sum(length(col("w"))) /
        count(lit(1)).cast("double")).as("cpw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(spm.nonEmpty)
    spm.foreach { case (lang, f) =>
      assert(f >= 1.0, s"$lang fertility below 1")
      assert(f < charBase(lang), s"$lang: trained fertility $f not better " +
        s"than char baseline ${charBase(lang)}")
    }
  }

  test("fertility comparison vs BPE: both families graded per language") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val spm = Text.spmFertilityByLang(docs, EntrySupport.spmModel(spark, dir), 4)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("fertility")).toMap
    val bpe = Text.bpeFertilityByLang(docs, EntrySupport.bpeMerges(spark, dir))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("fertility_r")).toMap
    assert(spm.keySet === bpe.keySet)
    // 300 trained pieces vs 32 merges: the unigram LM must win or tie
    // on the corpus-dominant language (the mixing-decision signal the
    // pair of queries exists to surface)
    val en = spm.keySet.find(_ == "en").getOrElse(spm.keySet.min)
    assert(spm(en) <= bpe(en) + 0.05,
      s"spm($en)=${spm(en)} much worse than bpe($en)=${bpe(en)}")
  }

  test("memo-fed seg slice ≡ internal DP; a missing word raises loudly") {
    val dir = "/root/testdata/sf0.001"
    val model = EntrySupport.spmModel(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val a = Text.spmEncodeDocs(docs, model, 4)
      .collect().map(_.toString).sorted.toSeq
    val b = Text.spmEncodeDocs(docs, model, 4,
        segRows = Some(EntrySupport.spmSegLocal(spark, dir)))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    // incomplete slice → loud raise, never a silently smaller corpus
    val err = intercept[Exception] {
      Text.spmEncodeDocs(docs, model, 4,
        segRows = Some(Seq(("nosuchword", 1L, 100L)))).collect()
    }
    assert(err.getMessage.contains("missing word") ||
      Option(err.getCause).exists(_.getMessage.contains("missing word")))
  }

  test("byte-fallback memo-fed slice ≡ internal fallback DP; a missing " +
      "word raises loudly (r17 — the encode twin's 1-job shape)") {
    val dir = "/root/testdata/sf0.001"
    val model = EntrySupport.spmModel(spark, dir)
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(EntrySupport.spmFallbackPlantedDocs.toDF("doc_id", "text"))
    val a = Text.spmEncodeDocs(docs, model, 4, byteFallback = true)
      .collect().map(_.toString).sorted.toSeq
    val b = Text.spmEncodeDocs(docs, model, 4, byteFallback = true,
        fbSegRows = Some(EntrySupport.spmSegFbLocal(spark, dir)))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    val err = intercept[Exception] {
      Text.spmEncodeDocs(docs, model, 4, byteFallback = true,
        fbSegRows = Some(Seq(("nosuchword", 1L, 100L, 0L)))).collect()
    }
    assert(err.getMessage.contains("missing word") ||
      Option(err.getCause).exists(_.getMessage.contains("missing word")))
  }

  test("sampled segmentation laws: tau=0 ≡ Viterbi; per-epoch " +
      "deterministic; true cost ≥ Viterbi cost; epochs diversify") {
    val dir = "/root/testdata/sf0.001"
    val model = EntrySupport.spmModel(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // tau = 0: the perturbed DP IS Viterbi
    assert(rows(Text.spmSampleEncodeDocs(docs, model, 4, tauU6 = 0, epoch = 1))
      === rows(Text.spmEncodeDocs(docs, model, 4)))
    // per-epoch bit-reproducibility (the seeded-RNG story)
    val e1 = rows(Text.spmSampleEncodeDocs(docs, model, 4, 300000L, epoch = 1))
    assert(e1 === rows(Text.spmSampleEncodeDocs(docs, model, 4, 300000L, epoch = 1)))
    // optimality bound: the sampled path's TRUE cost can never beat
    // Viterbi's, per doc (argmin over perturbed ≥ argmin over true)
    val vit = Text.spmEncodeDocs(docs, model, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    Text.spmSampleEncodeDocs(docs, model, 4, 300000L, epoch = 1)
      .collect().foreach { r =>
        assert(r.getLong(3) >= vit(r.getLong(0)),
          s"doc ${r.getLong(0)} sampled below the Viterbi cost")
      }
    // memo-fed pre-sampled slice ≡ internal (the segRows contract)
    assert(e1 === rows(Text.spmSampleEncodeDocs(docs, model, 4, 300000L,
      epoch = 1,
      segRows = Some(EntrySupport.spmSampleSegLocal(spark, dir, 300000L, 1)))))
    // diversity: on words with near-tied segmentations, different
    // epochs pick different paths (what regularization exists for)
    val close = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val closeModel = Seq("a" -> 100L, "b" -> 110L, "ab" -> 205L,
      "ba" -> 207L, "abab" -> 420L)
    val picks = (1 to 8).map { ep =>
      Text.spmSampleEncodeDocs(close, closeModel, 4, 300000L, epoch = ep)
        .collect().head.getLong(2) // n_spm
    }.toSet
    assert(picks.size > 1,
      s"8 epochs over near-tied segmentations never diversified: $picks")
  }

  test("streaming encode twin ≡ batch under the frozen model") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val dir = "/root/testdata/sf0.001"
    val model = EntrySupport.spmModel(spark, dir)
    val base = Files.createTempDirectory("graft-spm-stream").toString
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).limit(50)
    docs.write.parquet(s"$base/src")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    graft.streaming.StreamingCorpus.spmEncodeStream(
      spark, s"$base/src", schema, s"$base/ckpt", s"$base/sink",
      model, maxPieceLen = 4).awaitTermination()
    val streamed = spark.read.parquet(s"$base/sink")
      .collect().map(_.toString).sorted.toSeq
    val batch = Text.spmEncodeDocs(spark.read.parquet(s"$base/src"), model, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("empty input and wordless docs survive") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val model = Seq("a" -> 100L)
    assert(Text.spmEncodeDocs(empty, model, 4).count() === 0)
    // a doc with no word is dropped, not crashed
    val blank = Seq((1L, "   "), (2L, "a")).toDF("doc_id", "text")
    assert(Text.spmEncodeDocs(blank, model, 4)
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
