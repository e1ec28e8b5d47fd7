package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus

/** The increment ≡ union law: with every standing doc_id below every
  * batch doc_id, webCorpusIncrement(standing, batch) must assign the
  * SAME stage verdicts the full capstone re-run on the union assigns
  * to the batch rows — standing docs win every canonical/text race
  * exactly as their smaller ids would. (The declared query's DuckDB
  * oracle IS this law cross-engine; this spec pins it Spark-vs-Spark
  * on planted pages covering every duplicate class.)
  */
class WebCorpusIncrementSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val prose = (1 to 15).map(i => s"w$i").mkString(" ")

  private def page(id: Long, canon: Option[String], body: String,
                   noindex: Boolean = false, broken: Boolean = false,
                   title: String = "") =
    (id, "<html><head><title>" +
      (if (title.nonEmpty) title else "t" + id) + "</title>" +
      (if (noindex) "<meta name=\"robots\" content=\"noindex\">" else "") +
      canon.map(c => s"""<link rel="canonical" href="$c">""").getOrElse("") +
      "</head><body>" +
      (if (broken) "<script>var broken = [" else "<script>t()</script>") +
      s"<p>$body</p></body></html>")

  // capstone stage logic over a union frame (the q_web_corpus chain,
  // stages only)
  private def unionStages(pages: org.apache.spark.sql.DataFrame) = {
    val g = Corpus.crawlGate(pages, linkDensityPct = 30, keepText = true)
      .withColumn("passes",
        (col("status") === "ok" && col("verdict") === "index").cast("long"))
    val k1 = when(col("passes") === 1L && col("canonical").isNotNull,
        concat(lit("c:"), col("canonical")))
      .otherwise(concat(lit("d:"), col("doc_id").cast("string")))
    val r1 = g.withColumn("rn1",
        row_number().over(Window.partitionBy(k1).orderBy(col("doc_id"))))
      .withColumn("alive1", col("passes") === 1L && col("rn1") === 1)
    val k2 = when(col("alive1"), concat(lit("t:"), col("text")))
      .otherwise(concat(lit("d:"), col("doc_id").cast("string")))
    val r2 = r1.withColumn("rn2",
        row_number().over(Window.partitionBy(k2).orderBy(col("doc_id"))))
    Corpus.withGopher(r2)
      .select(col("doc_id"),
        when(col("status") === "quarantined", lit("quarantined"))
          .when(col("status") === "chrome", lit("chrome"))
          .when(col("verdict") === "drop", lit("noindex"))
          .when(col("rn1") =!= 1, lit("canonical_dup"))
          .when(col("rn2") =!= 1, lit("text_dup"))
          .when(coalesce(col("gopher_ok"), lit(0L)) =!= 1L, lit("low_quality"))
          .otherwise(lit("kept")).as("stage"))
  }

  test("increment verdicts equal the union capstone's on every planted " +
      "duplicate class") {
    val standing = Seq(
      page(1L, Some("https://e/c/0"), prose),          // canonical keeper
      page(2L, Some("https://e/c/0"), prose + " v2"),  // canonical dup
      page(3L, None, prose + " three"),                // text owner
      page(4L, None, prose + " four", noindex = true), // dead: noindex
      page(5L, None, prose + " five", broken = true)   // dead: quarantined
    ).toDF("doc_id", "html")
    val batch = Seq(
      page(101L, Some("https://e/c/0"), "x " + prose),   // canon claimed by standing
      page(102L, Some("https://e/c/9"), prose + " new1"),// fresh canonical -> keeper
      page(103L, Some("https://e/c/9"), prose + " new2"),// in-batch canonical dup
      // the title rides into the extraction, so a planted text dup
      // must impersonate the FULL page (title included)
      page(104L, None, prose + " three", title = "t3"), // text claimed by standing alive
      page(105L, None, prose + " four", title = "t4"),  // standing owner was DEAD -> kept
      page(106L, None, prose + " pairx", title = "pair"), // in-batch pair: keeper
      page(107L, None, prose + " pairx", title = "pair"), // in-batch pair: dup
      page(108L, None, "tiny words"),      // low quality (2 words)
      page(109L, None, prose + " solo", broken = true) // quarantined in batch
    ).toDF("doc_id", "html")
    val inc = Corpus.webCorpusIncrement(standing, batch)
      .select(col("doc_id"), col("stage"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val uni = unionStages(standing.unionByName(batch))
      .filter(col("doc_id") >= 100L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inc === uni)
    // the classes that CAN be asserted independent of titles
    assert(inc(101L) === "canonical_dup")
    assert(inc(102L) === "kept")
    assert(inc(103L) === "canonical_dup")
    assert(inc(104L) === "text_dup", "standing-claimed text must dup")
    assert(inc(105L) === "kept", "a DEAD standing owner must not claim the text")
    assert(inc(107L) === "text_dup" && inc(106L) === "kept")
    assert(inc(108L) === "low_quality")
    assert(inc(109L) === "quarantined")
    assert(inc.size === 9)

    // store-fed form ≡ in-plan form: round-trip the two standing
    // indexes through parquet (the q_web_corpus_store shape — the
    // materialized corpus-version store) and re-probe the same batch
    val base = java.nio.file.Files.createTempDirectory("graft-wcs").toString
    val (canonIdx, textIdx) = Corpus.webCorpusIndexes(standing)
    canonIdx.write.mode("overwrite").parquet(s"$base/canon")
    textIdx.write.mode("overwrite").parquet(s"$base/text")
    val stored = Corpus.webCorpusIncrementFrom(
        spark.read.parquet(s"$base/canon"), spark.read.parquet(s"$base/text"),
        batch)
      .select(col("doc_id"), col("stage"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stored === inc, "store-fed verdicts must equal in-plan verdicts")

    // the index WRITE-BACK law: appending the deltas to the standing
    // indexes must reproduce exactly the from-scratch index build over
    // standing ∪ batch (what tomorrow's run probes)
    val deltas = Corpus.webCorpusIndexDelta(canonIdx, textIdx, batch)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val cd = deltas.filter(_._1 == "canon").map(_._2)
    val td = deltas.filter(_._1 == "text").map(_._2)
    val standingCanon = canonIdx.collect().map(_.getString(0)).toSet
    val standingText = textIdx.collect().map(_.getString(0)).toSet
    val (uc, ut) = Corpus.webCorpusIndexes(standing.unionByName(batch))
    assert(standingCanon ++ cd === uc.collect().map(_.getString(0)).toSet,
      "canon index: append-maintenance must equal the union rebuild")
    assert(standingText ++ td === ut.collect().map(_.getString(0)).toSet,
      "text index: append-maintenance must equal the union rebuild")
    // deltas are truly new keys (append-ready: no overlap with standing)
    assert(cd.forall(!standingCanon.contains(_)))
    assert(td.forall(!standingText.contains(_)))
    // the batch plants both classes: a fresh canonical claim (102's
    // https://e/c/9) and fresh text hashes; the standing-claimed
    // canonical (c/0) must NOT re-enter
    assert(cd === Set("https://e/c/9"))
    assert(td.nonEmpty)
  }
}
