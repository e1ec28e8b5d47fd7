package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Multimodal, Sim, Text}

/** Randomized laws for the round-7 continuation operators (batches
  * 19-21) — invariants checked against brute force on adversarial
  * random inputs, seeds fixed for reproducibility.
  */
class Batch19to21Props extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("segmentDedup conservation: kept occurrences = distinct segments, any corpus") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val vocab = (0 until 6).map(i => s"v$i")
      val docs = (0 until 60).map { i =>
        (i.toLong, (0 to rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val w = 1 + rnd.nextInt(3)
      val out = Dedup.segmentDedup(docs, w)
        .agg(sum(col("n_segs") - col("n_dup"))).collect().head.getLong(0)
      // brute force: every distinct w-chunk across the corpus keeps
      // exactly its first occurrence
      val distinctSegs = docs.collect().flatMap { r =>
        r.getString(1).split(" ").filter(_.nonEmpty).grouped(w).map(_.mkString(" "))
      }.toSet.size
      assert(out === distinctSegs.toLong, s"trial $trial (w=$w)")
    }
  }

  test("knBigramLogProb converges to bigramLogProb as the discount vanishes") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(60)
    val kn = Text.knBigramLogProb(docs, discount = 1e-6).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    CacheScope.flush()
    val bg = Text.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    CacheScope.flush()
    assert(kn.keySet === bg.keySet)
    kn.foreach { case (id, v) =>
      assert(math.abs(v - bg(id)) < 1e-3, s"doc $id: KN(D→0)=$v vs bigram=${bg(id)}")
    }
  }

  test("rrfFuse: duplicating a ranking doubles scores but never reorders") {
    val rnd = new scala.util.Random(43)
    val ranking = (0 until 4).flatMap { q =>
      val ids = rnd.shuffle((10 to 40).toList).take(8)
      ids.zipWithIndex.map { case (c, i) => (q.toLong, c.toLong, (i + 1).toLong) }
    }.toDF("q_id", "c_id", "rnk")
    val once = Text.rrfFuse(Seq(ranking), k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(3), r.getLong(4)))).toMap
    val twice = Text.rrfFuse(Seq(ranking, ranking), k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(once.keySet === twice.keySet)
    once.foreach { case (k0, (s1, r1)) =>
      val (s2, r2) = twice(k0)
      assert(math.abs(s2 - 2 * s1) < 2e-6, s"$k0: dup list must double the score")
      assert(r1 === r2, s"$k0: fused order must not change")
    }
  }

  test("phashNearDupPairs: banding finds EVERY pair within hamming < bands (pigeonhole)") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      // random 64-bit base hashes; planted near-dups at hamming 1-3
      val bases = (0 until 30).map(_ => (0 until 64).map(_ => rnd.nextInt(2)).mkString)
      val rows = bases.zipWithIndex.flatMap { case (h, i) =>
        val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(3))
        val near = h.zipWithIndex
          .map { case (c, p) => if (flips.contains(p)) (if (c == '1') '0' else '1') else c }
          .mkString
        Seq((i.toLong * 2, 1, h), (i.toLong * 2 + 1, 1, near))
      }.toDF("media_id", "decoded", "ahash")
      val found = Multimodal.phashNearDupPairs(rows, hashBits = 64, bands = 4,
          maxHamming = 3)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // every planted (2i, 2i+1) pair has hamming ≤ 3 < bands=4 → must be found
      (0 until 30).foreach { i =>
        assert(found.contains((i.toLong * 2, i.toLong * 2 + 1)),
          s"trial $trial: planted pair $i missed")
      }
    }
  }

  test("cosineTopKSq: shortlist == corpus size recovers exact brute force on random vectors") {
    val rnd = new scala.util.Random(53)
    val emb = (0 until 80).map { i =>
      (i.toLong, Array.fill(12)((rnd.nextDouble() - 0.5).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val sq = Sim.cosineTopKSq(emb, nQueries = 4, k = 5, shortlist = 80)
      .select("q_id", "c_id", "rnk").collect().toSet
    CacheScope.flush()
    val exact = Sim.cosineTopK(emb, nQueries = 4, k = 5)
      .select("q_id", "c_id", "rnk").collect().toSet
    assert(sq === exact)
  }
}
