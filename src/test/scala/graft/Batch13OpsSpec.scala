package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sim, Text}

/** Batch-13 operator fixtures: TextRank keyword scoring, hard-negative
  * mining, and the k-NN label audit — pinned by graphs and embeddings
  * small enough to verify by hand (hub-vs-leaf ordering, the
  * same-class-exclusion rule, and an obvious label error).
  */
class Batch13OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- textrank ------------------------------------------------------------

  test("textrank: a hub token outranks leaves; scores stay near the (1-d)+d band") {
    // star graph: 'hub' adjacent to a, b, c; leaves only touch hub
    val docs = Seq((1L, "a hub b hub c hub a")).toDF("doc_id", "text")
    val out = Text.textrank(docs, 0.85, 5).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("hub") > out("a") && out("hub") > out("b") && out("hub") > out("c"),
      s"hub must dominate the star: $out")
    // undirected scores sum ~= |V| under the per-node (1-d) form
    assert(math.abs(out.values.sum - out.size) < 0.01)
  }

  test("textrank: two disconnected symmetric pairs score identically") {
    val docs = Seq((1L, "x y"), (2L, "p q")).toDF("doc_id", "text")
    val out = Text.textrank(docs, 0.85, 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.values.toSet.size === 1,
      "every node of two symmetric 2-cliques has the same stationary score")
    assert(out("x") === 1.0, "symmetric graph fixpoint is exactly 1.0")
  }

  test("textrank: self-adjacency (w w) contributes no edge") {
    val docs = Seq((1L, "w w w")).toDF("doc_id", "text")
    assert(Text.textrank(docs, 0.85, 2).count() === 0L,
      "a self-loop-only token has no neighbors, hence no node in the graph")
  }

  // ---- hardNegatives -------------------------------------------------------

  test("hardNegatives: same-label candidates are excluded, nearest other-class wins") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0),    // query
      (1L, Seq(1.0f, 0.01f), 0),   // same class, nearly identical — must NOT appear
      (2L, Seq(0.9f, 0.4f), 1),    // the hard negative
      (3L, Seq(-1.0f, 0.0f), 1))   // an easy negative
      .toDF("vec_id", "embedding", "label")
    val out = Sim.hardNegatives(emb, 1, 2).orderBy("rnk").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("c_id"))).toSeq === Seq(2L, 3L))
    assert(!out.map(_.getLong(out.head.fieldIndex("c_id"))).contains(1L),
      "a same-class vector is never a negative, however close")
  }

  // ---- knnLabelVote --------------------------------------------------------

  test("knnLabelVote: a mislabeled vector is outvoted by its neighborhood") {
    // vec 0 (held out, labeled 9) sits inside a tight class-1 blob
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 9),
      (1L, Seq(0.99f, 0.05f), 1),
      (2L, Seq(0.98f, 0.06f), 1),
      (3L, Seq(0.97f, 0.07f), 1),
      (7L, Seq(-1.0f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Sim.knnLabelVote(emb, 10, 3).collect().head
    assert(out.getLong(out.fieldIndex("vec_id")) === 0L)
    assert(out.getInt(out.fieldIndex("pred_label")) === 1)
    assert(out.getLong(out.fieldIndex("votes")) === 3L)
    assert(out.getLong(out.fieldIndex("correct")) === 0L,
      "label 9 vs neighborhood vote 1 — exactly the annotation-error signal")
  }

  test("knnLabelVote: vote ties break toward the smaller label deterministically") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 5),
      (1L, Seq(0.9f, 0.1f), 2),
      (2L, Seq(0.9f, -0.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Sim.knnLabelVote(emb, 10, 2).collect().head
    assert(out.getInt(out.fieldIndex("pred_label")) === 1,
      "1 vote each for labels 1 and 2 — the tie must break to label 1, every run")
  }
}
