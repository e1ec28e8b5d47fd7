package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Sim}

/** Contracts for [[Sim.semanticDedupKeepers]] (SemDeDup, Abbas et al.
  * 2023): the oracle row (`q_dedup_semantic`) pins the exact
  * assignment/pair/keeper arithmetic against DuckDB; these specs pin
  * the SEMANTIC properties on a clustered fixture — the testdata
  * embeddings are isotropic (near-zero cosines), so like KmeansIvfSpec
  * this grades on Gaussian blobs, the shape real embedding corpora
  * have and the regime the cluster-bounded pair search exists for.
  */
class SemanticDedupSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  /** 8 blobs × 40 points, 64-dim, radius 0.10 — tight enough that
    * within-blob cosine is high (≈0.9+) and cross-blob cosine is low,
    * so a 0.8 threshold separates them cleanly. Seeded fixture.
    */
  private lazy val emb = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.10 * rnd.nextGaussian()).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("planted exact duplicates collapse to the original's id") {
    import spark.implicits._
    // Copy vectors 0..9 under fresh ids 1000..1009: identical arrays
    // always share a cell (deterministic argmax) and have cosine 1.0,
    // so each copy must keep its (smaller-id) original.
    val base = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val copies = base.take(10).map { case (id, v) => (1000L + id, v) }
    val withCopies = (base ++ copies).toSeq.toDF("vec_id", "embedding")
    val out = Sim.semanticDedupKeepers(withCopies,
        nCells = 8, iters = 4, sampleMod = 2, minCos = 0.95)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0 until 10).foreach { i =>
      assert(out(1000L + i) === out(i.toLong),
        s"copy 100$i should share its original's keeper")
    }
  }

  test("keeper rule: keep_id <= vec_id, one row per vector, cells in range") {
    val out = Sim.semanticDedupKeepers(emb,
      nCells = 8, iters = 4, sampleMod = 2, minCos = 0.80)
    val rows = out.collect()
    assert(rows.length === 320)
    assert(rows.map(_.getLong(0)).distinct.length === 320)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(0), s"keep_id must be min-id: $r")
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8, s"cell out of range: $r")
    }
  }

  test("cluster-bounded pair search recovers >= 80% of brute-force near-dup pairs") {
    // Ground truth: ALL pairs with cos_r >= 0.8 (brute force over the
    // 320-vector fixture via the oracle-checked pair query). SemDeDup
    // is approximate exactly where a true near-dup pair straddles a
    // cell boundary; on blob data that loss must be small — this is
    // the paper's central claim and this operator's fitness bound.
    val truth = Dedup.embeddingNearDupPairs(emb, cap = 320, n = 320 * 319 / 2)
      .filter(col("cos_r") >= 0.80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain near-dup pairs")
    // Recover the found pair set from keepers: vectors sharing a
    // keeper are transitively linked; count direct truth pairs whose
    // endpoints landed in the same cell (the operator's candidate
    // scope) as recovered.
    val out = Sim.semanticDedupKeepers(emb,
        nCells = 8, iters = 4, sampleMod = 2, minCos = 0.80)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val recovered = truth.count { case (a, b) => out(a)._1 == out(b)._1 }
    val recall = recovered.toDouble / truth.size
    assert(recall >= 0.8, s"same-cell pair recall = $recall")
    // And every same-cell true pair must be reflected in the keeper
    // graph: both endpoints' keepers are below the pair's max id.
    truth.foreach { case (a, b) =>
      if (out(a)._1 == out(b)._1)
        assert(out(b)._2 < b || out(a)._2 < a || out(a)._2 == out(b)._2,
          s"same-cell pair ($a,$b) left no keeper trace")
    }
  }

  test("no pairs above threshold => every vector keeps itself") {
    val out = Sim.semanticDedupKeepers(emb,
      nCells = 8, iters = 4, sampleMod = 2, minCos = 1.01)
    assert(out.filter(col("keep_id") =!= col("vec_id")).count() === 0)
  }
}
