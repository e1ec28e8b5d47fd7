package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, Dedup, Relational, Sim, Text}

/** Randomized laws for the round-6 continuation operators (batches
  * 12-17) — invariants checked against brute force on adversarial
  * random inputs, seeds fixed for reproducibility.
  */
class Batch12to17Props extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("temperatureWeights: weights sum to 1 and order-match token counts, any alpha") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val nSrc = 2 + rnd.nextInt(5)
      val docs = (0 until 120).map { i =>
        val s = rnd.nextInt(nSrc)
        (i.toLong, (0 to rnd.nextInt(9)).map(_ => s"t${rnd.nextInt(20)}").mkString(" "),
          s"src$s")
      }.toDF("doc_id", "text", "source")
      val alpha = rnd.nextDouble()
      val out = Corpus.temperatureWeights(docs, "source", alpha).collect()
      val wSum = out.map(r => r.getDouble(r.fieldIndex("temp_weight_r"))).sum
      assert(math.abs(wSum - 1.0) < 1e-3, s"trial $trial: weights sum $wSum")
      // alpha < 1 compresses: the weight ORDER still follows token counts
      val byTok = out.sortBy(r => r.getLong(r.fieldIndex("n_tokens")))
        .map(r => r.getDouble(r.fieldIndex("temp_weight_r")))
      assert(byTok.sliding(2).forall { case Array(a, b) => a <= b + 1e-9 },
        s"trial $trial: weight order broke")
    }
  }

  test("incrementalNewDocs: verdict columns partition the batch; keepers are exactly the novel firsts") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 5) {
      val corpusTexts = (0 until 30).map(i => s"c${rnd.nextInt(20)}")
      val batchTexts = (0 until 40).map(i =>
        if (rnd.nextBoolean()) s"c${rnd.nextInt(20)}" else s"b${rnd.nextInt(10)}")
      val corpus = corpusTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = batchTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text")
      val out = Dedup.incrementalNewDocs(corpus, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // brute force
      val corpusSet = corpusTexts.toSet
      val firstIn = batchTexts.zipWithIndex
        .groupBy(_._1).view.mapValues(_.map(_._2 + 100).min).toMap
      out.foreach { case (id, dupC, dupB, keep) =>
        val t = batchTexts((id - 100).toInt)
        assert(dupC === (if (corpusSet(t)) 1L else 0L), s"trial $trial id $id dupC")
        assert(dupB === (if (firstIn(t) < id) 1L else 0L), s"trial $trial id $id dupB")
        assert(keep === (if (!corpusSet(t) && firstIn(t) == id) 1L else 0L),
          s"trial $trial id $id keep")
      }
    }
  }

  test("winnow: fingerprints of a doc are a subset of its gram hashes, and every full window is covered") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(30)
      val text = (0 until n).map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val fp = Text.winnow(docs, 3, 4).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      val m = n - 2 // gram count
      if (m >= 4) {
        assert(fp.nonEmpty, s"trial $trial: >=1 fingerprint for $m grams")
        // positions in range, and between consecutive fingerprints the
        // gap never exceeds the window (winnowing's coverage guarantee)
        val pos = fp.map(_._1).sorted
        assert(pos.head >= 1 && pos.last <= m)
        assert(pos.sliding(2).forall { case Array(a, b) => b - a <= 4; case _ => true },
          s"trial $trial: window-sized gap violated in ${pos.toSeq}")
      } else assert(fp.isEmpty)
    }
  }

  test("kAnonymize: released cells always have >= k subjects; suppressed values always null") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 5) {
      val k = 2 + rnd.nextInt(3)
      val df = (0 until 200).map { _ =>
        (s"g${rnd.nextInt(12)}", rnd.nextInt(25).toLong, rnd.nextDouble())
      }.toDF("qi", "user_id", "value")
      val out = Relational.kAnonymize(df, Seq("qi"), "user_id", "value", k).collect()
      out.foreach { r =>
        val nSubj = r.getLong(r.fieldIndex("n_subjects"))
        val suppressed = r.getLong(r.fieldIndex("suppressed"))
        assert(suppressed === (if (nSubj >= k) 0L else 1L))
        if (suppressed == 1L)
          assert(r.isNullAt(r.fieldIndex("sum_v_released")), "leak!")
      }
    }
  }

  test("reservoirSample: samples are nested across n and invariant to row order") {
    val rnd = new scala.util.Random(47)
    val docs = rnd.shuffle((1L to 300L).toList).map(i => (i, "x"))
      .toDF("doc_id", "text")
    val sizes = Seq(5, 20, 80)
    val samples = sizes.map(n =>
      Corpus.reservoirSample(docs, n).collect().map(_.getLong(0)).toSet)
    assert(samples(0).subsetOf(samples(1)) && samples(1).subsetOf(samples(2)))
    assert(samples.map(_.size) === sizes)
  }

  test("sourceKlDivergence: invariant under document re-grouping within a source") {
    // KL depends only on per-source token MULTISETS, not doc boundaries
    val a = Seq((1L, "x y z x", "s1"), (2L, "y y", "s1"), (3L, "p q", "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq((1L, "x y z x y y", "s1"), (3L, "p q", "s2"))
      .toDF("doc_id", "text", "source")
    val ka = Text.sourceKlDivergence(a).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("kl_r"))).toMap
    val kb = Text.sourceKlDivergence(b).collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("kl_r"))).toMap
    assert(ka === kb)
  }

  test("repetitionSignals: bounds and degeneracy laws on random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val docs = (0 until 60).map { i =>
        val n = 1 + rnd.nextInt(30)
        (i.toLong, (0 until n).map(_ => s"t${rnd.nextInt(1 + rnd.nextInt(8))}").mkString(" "))
      }.toDF("doc_id", "text")
      val out = Text.repetitionSignals(docs).collect()
      assert(out.length === 60, s"trial $trial: one row per doc")
      out.foreach { r =>
        val (n, dr, run, bf) = (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
        assert(dr > 0.0 && dr <= 1.0, s"trial $trial: distinct ratio $dr")
        assert(run >= 1 && run <= n, s"trial $trial: run $run of $n")
        // overlapping bigram instances can cover a token twice, so the
        // fraction is bounded by 2, and a single-token doc reads 0
        assert(bf >= 0.0 && bf <= 2.0, s"trial $trial: bigram frac $bf")
        if (n == 1) assert(bf === 0.0)
        // a doc with max_run == n_toks is one repeated token: ratio 1/n
        if (run == n && n > 1)
          assert(math.abs(dr - math.rint(1e4 / n) / 1e4) < 1e-9,
            s"trial $trial: degenerate doc ratio $dr for n=$n")
      }
    }
  }

  test("interpolatedLogProb: scores are negative log-probs, monotone corpora agree at both ends") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 3) {
      val docs = (0 until 40).map { i =>
        val n = 2 + rnd.nextInt(20)
        (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
      }.toDF("doc_id", "text")
      val lam = rnd.nextDouble()
      val out = Text.interpolatedLogProb(docs, lam).collect()
      CacheScope.flush()
      assert(out.nonEmpty)
      out.foreach { r =>
        val s = r.getDouble(2)
        // P in (0, 1] always (mixture of two probabilities) → ln ≤ 0
        assert(s <= 1e-9, s"trial $trial λ=$lam: positive log-prob $s")
      }
    }
  }

  test("ngramNovelty: novel counts partition the shingle vocabulary (conservation law)") {
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val docs = (0 until 50).map { i =>
        val n = 3 + rnd.nextInt(15)
        (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(10)}").mkString(" "))
      }.toDF("doc_id", "text")
      val out = Dedup.ngramNovelty(docs).collect()
      CacheScope.flush()
      // every distinct shingle hash is attributed to exactly ONE doc
      // (its min-id owner), so novel counts sum to the vocabulary size
      val vocab = Dedup.hashedShingles(docs).select("h").distinct().count()
      CacheScope.flush()
      assert(out.map(_.getLong(2)).sum === vocab,
        s"trial $trial: attribution not a partition")
      assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    }
  }

  test("clusterPurity: purities in (0,1], populations sum to the table, majority is argmax") {
    val rnd = new scala.util.Random(47)
    val dim = 8
    val emb = (0 until 120).map { i =>
      (i.toLong,
        Array.tabulate(dim)(j => (rnd.nextDouble() - 0.5).toFloat),
        rnd.nextInt(4))
    }.toDF("vec_id", "embedding", "label")
    val out = Sim.clusterPurity(emb, nCells = 4, iters = 2, sampleMod = 1).collect()
    assert(out.map(_.getLong(1)).sum === 120L, "populations partition the table")
    out.foreach { r =>
      val p = r.getDouble(3)
      assert(p > 0.0 && p <= 1.0, s"purity $p")
      // majority fraction of a 4-label cell is at least 1/4
      assert(p >= 1.0 / 4 - 1e-9)
    }
  }
}
