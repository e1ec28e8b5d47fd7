package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, Dedup, Relational, Sim, Text}

/** Batch-12 operator fixtures: temperature source mixing, per-group
  * percentile normalization, k-anonymity suppression, OOV-rate
  * scoring, incremental batch dedup, source-overlap matrix, and
  * embedding prototypicality — pinned by hand-computable examples
  * including the suppression boundary, the all-in-vocab doc, and the
  * within-batch-duplicate keeper rule.
  */
class Batch12OpsSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- temperatureWeights --------------------------------------------------

  test("temperatureWeights: alpha=1 reproduces raw shares; alpha=0 equalizes") {
    val docs = Seq(
      (1L, "a b c d", "big"), (2L, "a b c d", "big"),
      (3L, "a b c d", "big"), (4L, "a b c d", "small"))
      .toDF("doc_id", "text", "source")
    val raw = Corpus.temperatureWeights(docs, "source", 1.0)
      .orderBy("source").collect()
    // big: 12 of 16 tokens; small: 4 of 16
    assert(raw.map(r => r.getDouble(r.fieldIndex("temp_weight_r"))).toSeq ===
      Seq(0.75, 0.25))
    val flat = Corpus.temperatureWeights(docs, "source", 0.0)
      .orderBy("source").collect()
    assert(flat.map(r => r.getDouble(r.fieldIndex("temp_weight_r"))).toSeq ===
      Seq(0.5, 0.5))
  }

  test("temperatureWeights: epochs = weight * total / own (the overfit audit)") {
    val docs = Seq(
      (1L, "a b c d e f g h i", "big"),   // 9 tokens
      (2L, "a b c", "small"))              // 3 tokens
      .toDF("doc_id", "text", "source")
    val out = Corpus.temperatureWeights(docs, "source", 0.5)
      .orderBy("source").collect()
    // w_big = 3/(3+sqrt(3)) , epochs_big = w_big*12/9
    val wBig = 3.0 / (3.0 + math.sqrt(3.0))
    val eBig = out.head.getDouble(out.head.fieldIndex("epochs_r"))
    assert(math.abs(eBig - wBig * 12.0 / 9.0) < 1e-3)
    // the small source is repeated >1x under alpha<1: that is the point
    val eSmall = out.last.getDouble(out.last.fieldIndex("epochs_r"))
    assert(eSmall > 1.0)
  }

  // ---- percentileNormalize -------------------------------------------------

  test("percentileNormalize: within-group percent_rank and median verdict") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 1000.0), (5L, "b", 2000.0))
      .toDF("doc_id", "grp", "score")
    val out = Corpus.percentileNormalize(df, "grp", "score")
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getDouble(r.fieldIndex("pr_r"))).toSeq ===
      Seq(0.0, 0.5, 1.0, 0.0, 1.0))
    // group medians differ by 100x but the verdict is comparable
    assert(out.map(r => r.getLong(r.fieldIndex("above_median"))).toSeq ===
      Seq(0L, 1L, 1L, 0L, 1L))
    assert(out.head.getDouble(out.head.fieldIndex("grp_median_r")) === 20.0)
    assert(out.last.getDouble(out.last.fieldIndex("grp_median_r")) === 1500.0)
  }

  // ---- kAnonymize ----------------------------------------------------------

  test("kAnonymize: groups below k are suppressed and their values withheld") {
    val df = Seq(
      ("x", 1L, 1.0), ("x", 2L, 2.0), ("x", 3L, 3.0),
      ("y", 7L, 10.0), ("y", 7L, 20.0)) // 1 distinct subject, 2 rows
      .toDF("qi", "user_id", "value")
    val out = Relational.kAnonymize(df, Seq("qi"), "user_id", "value", 2)
      .orderBy("qi").collect()
    val x = out.head
    assert(x.getLong(x.fieldIndex("n_subjects")) === 3L)
    assert(x.getLong(x.fieldIndex("suppressed")) === 0L)
    assert(x.getDouble(x.fieldIndex("sum_v_released")) === 6.0)
    val y = out.last
    assert(y.getLong(y.fieldIndex("n_subjects")) === 1L)
    assert(y.getLong(y.fieldIndex("suppressed")) === 1L)
    assert(y.isNullAt(y.fieldIndex("sum_v_released")),
      "suppressed cells must WITHHOLD the value, not just flag it")
  }

  test("kAnonymize: boundary group (exactly k subjects) is released") {
    val df = Seq(("x", 1L, 1.0), ("x", 2L, 1.0)).toDF("qi", "user_id", "value")
    val out = Relational.kAnonymize(df, Seq("qi"), "user_id", "value", 2).collect().head
    assert(out.getLong(out.fieldIndex("suppressed")) === 0L)
  }

  // ---- oovRate -------------------------------------------------------------

  test("oovRate: tokens below the df floor count as OOV") {
    // 'common' df=3; 'mid' df=2; 'rare' df=1
    val docs = Seq(
      (1L, "common mid rare"),
      (2L, "common mid"),
      (3L, "common common"))
      .toDF("doc_id", "text")
    val out = Text.oovRate(docs, 2L).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(r.fieldIndex("n_tok")),
                         r.getLong(r.fieldIndex("n_oov")))).toSeq ===
      Seq((3L, 1L), (2L, 0L), (2L, 0L)))
    assert(out.head.getDouble(out.head.fieldIndex("oov_rate_r")) === 0.333333)
  }

  // ---- incrementalNewDocs --------------------------------------------------

  test("incrementalNewDocs: corpus-dup, batch-dup, and keeper verdicts") {
    val corpus = Seq((1L, "old text"), (2L, "other old")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "old text"),   // dup of corpus
      (11L, "fresh one"),  // keeper
      (12L, "fresh one"),  // dup within batch (11 arrived first)
      (13L, "fresh two"))  // keeper
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNewDocs(corpus, batch)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (10L, 1L, 0L, 0L),
      (11L, 0L, 0L, 1L),
      (12L, 0L, 1L, 0L),
      (13L, 0L, 0L, 1L)))
  }

  test("incrementalNewDocs: a batch dup that ALSO exists in the corpus is not a keeper under either rule") {
    val corpus = Seq((1L, "t")).toDF("doc_id", "text")
    val batch = Seq((10L, "t"), (11L, "t")).toDF("doc_id", "text")
    val out = Dedup.incrementalNewDocs(corpus, batch)
      .agg(sum(col("keep"))).collect().head.getLong(0)
    assert(out === 0L)
  }

  // ---- sourceOverlapMatrix -------------------------------------------------

  test("sourceOverlapMatrix: identical sources have jaccard 1, disjoint 0") {
    val docs = Seq(
      (1L, "a b c d e", "s1"),
      (2L, "a b c d e", "s2"),     // identical shingles to s1
      (3L, "x y z w q", "s3"))     // disjoint
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlapMatrix(docs)
      .orderBy("src_a", "src_b").collect()
      .map(r => ((r.getString(r.fieldIndex("src_a")),
                  r.getString(r.fieldIndex("src_b"))),
                 r.getDouble(r.fieldIndex("jaccard_r")))).toMap
    assert(out(("s1", "s2")) === 1.0)
    assert(!out.contains(("s1", "s3")),
      "disjoint sources share no shingle, so the inverted-index join never emits them")
  }

  // ---- prototypicality -----------------------------------------------------

  test("prototypicality: the centroid-nearest vector ranks first in its class") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 0),   // the outlier of class 0
      (4L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Sim.prototypicality(emb).orderBy("vec_id").collect()
    val rnk = out.map(r => r.getLong(r.fieldIndex("proto_rnk"))).toSeq
    assert(rnk(3) === 1L, "a singleton class is its own centroid")
    assert(out(3).getDouble(out(3).fieldIndex("cos_r")) === 1.0)
    // class 0 centroid ~ (0.63,0.37): vec 2 is nearest, vec 3 is last
    assert(out(1).getLong(out(1).fieldIndex("proto_rnk")) === 1L)
    assert(rnk(2) === 3L, "the outlier ranks last — that is the pruning signal")
  }
}
