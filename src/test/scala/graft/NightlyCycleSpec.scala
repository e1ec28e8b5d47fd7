package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus

/** The composed nightly cycle (VERDICT r16 #2): ONE run emits both
  * the per-page verdicts and the index write-back deltas, each half
  * exactly equal to its standalone operator, from a single linear
  * plan that pays the page extraction once. Plus the day-2 junction:
  * appending day-1's deltas and running day 2 behaves exactly like a
  * full index rebuild would.
  */
class NightlyCycleSpec extends AnyFunSuite {

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

  private val standing = Seq(
    page(1L, Some("https://e/c/0"), prose),
    page(2L, Some("https://e/c/0"), prose + " v2"),
    page(3L, None, prose + " three"),
    page(4L, None, prose + " four", noindex = true),
    page(5L, None, prose + " five", broken = true)
  ).toDF("doc_id", "html")

  private val batch = Seq(
    page(101L, Some("https://e/c/0"), "x " + prose),
    page(102L, Some("https://e/c/9"), prose + " new1"),
    page(103L, Some("https://e/c/9"), prose + " new2"),
    page(104L, None, prose + " three", title = "t3"),
    page(105L, None, prose + " four", title = "t4"),
    page(106L, None, prose + " pairx", title = "pair"),
    page(107L, None, prose + " pairx", title = "pair"),
    page(108L, None, "tiny words"),
    page(109L, None, prose + " solo", broken = true)
  ).toDF("doc_id", "html")

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(s.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def verdictHalf(cycle: DataFrame) = cycle
    .filter(col("part") === "verdict")
    .select(col("doc_id"), col("stage"), col("tok_cnt"))
    .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    .sortBy(_._1)

  private def deltaHalf(cycle: DataFrame) = cycle
    .filter(col("part") === "delta")
    .select(col("kind"), col("key"))
    .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("one cycle run ≡ the two standalone halves, from one pass over " +
      "the batch") {
    val (ci, ti) = Corpus.webCorpusIndexes(standing)
    val cycle = Corpus.webCorpusNightlyCycle(ci, ti, batch)

    val verdicts = Corpus.webCorpusIncrementFrom(ci, ti, batch)
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
      .sortBy(_._1)
    assert(verdictHalf(cycle) === verdicts.toSeq,
      "the verdict half must equal webCorpusIncrementFrom exactly")

    val deltas = Corpus.webCorpusIndexDelta(ci, ti, batch)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(deltaHalf(cycle) === deltas,
      "the delta half must equal webCorpusIndexDelta exactly")
    assert(deltas.contains(("canon", "https://e/c/9")))

    // the ONE-PASS pin: with the batch on parquet (the declared
    // query's shape — a LocalRelation would get its projections
    // constant-folded away), the pages enter the executed plan through
    // exactly one file scan; a branch split re-running the extraction
    // per half would show the source twice
    val base = java.nio.file.Files.createTempDirectory("graft-nc").toString
    batch.write.parquet(s"$base/pages")
    val cycleP = Corpus.webCorpusNightlyCycle(
      ci, ti, spark.read.parquet(s"$base/pages"))
    cycleP.collect()
    val htmlScans = flatten(cycleP.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("html") => f
    }
    assert(htmlScans.size === 1,
      s"the batch must be scanned once, found ${htmlScans.size} scans")
  }

  test("day 2: appending day-1 deltas makes tomorrow's cycle behave " +
      "exactly like a full index rebuild") {
    val (ci0, ti0) = Corpus.webCorpusIndexes(standing)
    val d1 = Corpus.webCorpusNightlyCycle(ci0, ti0, batch)
      .filter(col("part") === "delta").select(col("kind"), col("key"))
    val ci1 = ci0.unionByName(
      d1.filter(col("kind") === "canon").select(col("key").as("canonical")))
    val ti1 = ti0.unionByName(
      d1.filter(col("kind") === "text").select(col("key").as("th")))

    // day-2 batch: a recrawl of day-1's kept fresh page (must text_dup
    // against the APPENDED index), a claimer of day-1's fresh
    // canonical (must canonical_dup), and a genuinely new page
    val day2 = Seq(
      page(201L, None, prose + " new1", title = "t102"),
      page(202L, Some("https://e/c/9"), prose + " claim2"),
      page(203L, None, prose + " novel")
    ).toDF("doc_id", "html")

    val cycle2 = Corpus.webCorpusNightlyCycle(ci1, ti1, day2)
    val (uc, ut) = Corpus.webCorpusIndexes(standing.unionByName(batch))
    val rebuilt2 = Corpus.webCorpusNightlyCycle(uc, ut, day2)
    assert(verdictHalf(cycle2) === verdictHalf(rebuilt2).toSeq,
      "day-2 verdicts over the appended store must equal the rebuild's")
    assert(deltaHalf(cycle2) === deltaHalf(rebuilt2),
      "day-2 deltas over the appended store must equal the rebuild's")

    val v2 = verdictHalf(cycle2).map(t => t._1 -> t._2).toMap
    assert(v2(202L) === "canonical_dup",
      "day-1's fresh canonical must be claimed on day 2")
    assert(v2(203L) === "kept")
    // NEGATIVE control: against the STALE day-0 store the claimer
    // sails through — the write-back is what makes day 2 correct
    val stale = Corpus.webCorpusNightlyCycle(ci0, ti0, day2)
    val vs = verdictHalf(stale).map(t => t._1 -> t._2).toMap
    assert(vs(202L) === "kept", "control: stale store should admit the claimer")
  }
}
