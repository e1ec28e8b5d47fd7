package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Corpus

/** The broadcast-budget fallback of the standing-index probe
  * (VERDICT r16 #1): with the two web-corpus indexes written as
  * bucketed tables on their key, (1) verdicts and write-back deltas
  * are ROW-FOR-ROW identical to the broadcast forms — the physical
  * probe swap is invisible to the semantics; (2) the executed plan is
  * the semi-join reduction: every sort-merge probe's standing side
  * reads its bucket files with ZERO exchanges and ZERO sorts (the
  * in-bucket order is trusted — Tables.sessionConfigs), only narrow
  * batch-bounded key sets enter the probe exchanges, and the hit sets
  * come back as broadcasts bounded by the BATCH's distinct keys,
  * never by the index — the property that makes the nightly cycle
  * survive indexes that outgrow any broadcast budget.
  */
class BucketedIndexProbeSpec extends AnyFunSuite {

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
    // the r18 fused hit-set probes run INSIDE the shared CacheScope
    // materialization — descend through the cache boundary so the
    // probe-shape assertions still see them
    case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      p +: flatten(im.relation.cachedPlan)
    case other => other +: other.children.flatMap(flatten)
  }

  private def isBucketedScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
    case _ => false
  }

  // walk that STOPS at broadcast builds: a bucketed scan reachable
  // only through a broadcast hit-set's lineage is not this side's
  // stream (the candidate side of a later probe carries the earlier
  // probe's broadcast internally)
  private def flattenStreamed(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flattenStreamed(a.executedPlan)
    case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      Seq(b)
    case s: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec =>
      Seq(s)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flattenStreamed(s.plan)
    case other => other +: other.children.flatMap(flattenStreamed)
  }

  private def assertStandingSideColocated(df: DataFrame, expectedProbes: Int): Unit = {
    val plan = flatten(df.queryExecution.executedPlan)
    // probes are sort-merge (the outer/anti chain, standing right) or
    // shuffled-hash semis (standing streamed LEFT, candidate build
    // right); either way the standing side is the child STREAMING the
    // bucketed scan — and it must reach the join with no exchange and
    // no sort while the other (candidate) side pays its narrow one
    // the standing side's scan is reachable WITHOUT crossing another
    // join — a chained probe's candidate child contains the previous
    // probe (and its streamed scan) below a join node
    def directBucketedScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
      case _: org.apache.spark.sql.execution.joins.BaseJoinExec => false
      case a: AdaptiveSparkPlanExec => directBucketedScan(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        directBucketedScan(s.plan)
      case other => other.children.exists(directBucketedScan)
    }
    def split(j: SparkPlan): Option[(SparkPlan, Seq[SparkPlan], Seq[SparkPlan])] = {
      val (st, cand) = j.children.partition(directBucketedScan)
      if (st.isEmpty) None
      else Some((j, st.flatMap(flattenStreamed), cand.flatMap(flatten)))
    }
    // dedup by the probe's LOGICAL identity (join type + key names +
    // the standing side's bucket files): the r18 fused hit-set cache
    // is REFERENCED at both flag-attach points, so the same two semi
    // probes appear twice in a tree walk (through both cache-scan
    // references, each copy with fresh exprIds that defeat
    // canonicalized-equality) while executing once — the probe COUNT
    // is a logical property, the single-build property is asserted
    // separately by assertSingleHitSetBuild
    def probeKey(j: SparkPlan, standing: Seq[SparkPlan]): String = {
      val keys = j match {
        case b: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          (b.joinType.toString +:
            (b.leftKeys ++ b.rightKeys)
              .map(_.references.map(_.name).toSeq.sorted.mkString(",")))
            .mkString("|")
        case other => other.nodeName
      }
      val scans = standing.collect {
        case f: FileSourceScanExec => f.relation.location.rootPaths.mkString(",")
      }.sorted.mkString(";")
      keys + "#" + scans
    }
    val probes: Seq[(SparkPlan, Seq[SparkPlan], Seq[SparkPlan])] = plan.collect {
      case j: SortMergeJoinExec => split(j)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        split(j)
    }.flatten
      .groupBy(p => probeKey(p._1, p._2)).values.map(_.head).toSeq
    assert(probes.size === expectedProbes,
      s"expected $expectedProbes shuffle-side probes, got ${probes.size}:\n" +
        probes.map(_._1.verboseString(2)).mkString("\n---\n"))
    probes.foreach { case (j, standingSub, candSub) =>
      assert(standingSub.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        "the standing (index) side of a probe must never exchange:\n" + j)
      assert(standingSub.collect { case s: SortExec => s }.isEmpty,
        "the standing side must stream unsorted off its bucket scan:\n" + j)
      assert(candSub.exists(_.isInstanceOf[ShuffleExchangeExec]),
        "control: the candidate side should shuffle into the bucket layout:\n" + j)
    }
  }

  // the r18 fused hit-set build: both flag attaches must broadcast the
  // SAME CacheScope-materialized hits frame — the semi probes run once
  // in the shared cache build, never replayed under a flag broadcast
  private def assertSingleHitSetBuild(df: DataFrame): Unit = {
    // walk that descends AQE stages but NOT cache boundaries: what
    // executes under each broadcast is exactly what this sees
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: walk(s.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val plan = walk(df.queryExecution.executedPlan)
    val builds: Seq[SparkPlan] = plan.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if b.output.exists(_.name == "__hit") => b: SparkPlan
    }.groupBy(System.identityHashCode).values.map(_.head).toSeq
    assert(builds.nonEmpty, "expected the fused __hit broadcast in the plan")
    val caches = builds.flatMap(b => walk(b).collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        im
    })
    assert(caches.size === builds.size,
      "every __hit broadcast must read the shared hits cache directly")
    assert(caches.map(c =>
        System.identityHashCode(c.relation.cacheBuilder)).distinct.size === 1,
      "both flag attaches must share ONE materialized hits frame")
    builds.foreach { b =>
      assert(walk(b).collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty,
        "the semi probes must run inside the one cache build, " +
          "never replayed under a flag broadcast:\n" + b)
    }
  }

  // the bucketed standing-index fixture: written once, registered as
  // bucketed catalog tables exactly like the declared query's prepare
  private lazy val bucketedIdx: (DataFrame, DataFrame) = {
    val base = java.nio.file.Files.createTempDirectory("graft-bip").toString
    val (canonIdx, textIdx) = Corpus.webCorpusIndexes(standing)
    canonIdx.repartition(8, col("canonical"))
      .write.bucketBy(8, "canonical").sortBy("canonical")
      .option("path", s"$base/c").mode("overwrite").saveAsTable("bip_canon")
    textIdx.repartition(8, col("th"))
      .write.bucketBy(8, "th").sortBy("th")
      .option("path", s"$base/t").mode("overwrite").saveAsTable("bip_text")
    (spark.table("bip_canon"), spark.table("bip_text"))
  }

  test("bucketed probe verdicts ≡ broadcast probe verdicts, standing " +
      "sides exchange-free, hit sets broadcast batch-bounded") {
    val (canonIdx, textIdx) = Corpus.webCorpusIndexes(standing)
    val (bc, bt) = bucketedIdx
    val broadcastForm = Corpus.webCorpusIncrementFrom(canonIdx, textIdx, batch)
      .select(col("doc_id"), col("stage"), col("tok_cnt"))
    val bucketedForm = Corpus.webCorpusIncrementFromBucketed(bc, bt, batch)
      .select(col("doc_id"), col("stage"), col("tok_cnt"))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).sortBy(_._1)
    assert(rows(bucketedForm) === rows(broadcastForm).toSeq,
      "the physical probe swap must be invisible to the verdicts")

    // two semi probes (canon, text) with co-located standing sides...
    assertStandingSideColocated(bucketedForm, expectedProbes = 2)
    // ...their hit sets riding back as ONE fused broadcast (r18): the
    // composite-key union frame carries both key sets, both flag
    // attaches are broadcast joins on __pk, and the build executes
    // once (stage reuse) — the flags themselves are withColumn-derived
    // from __hit, so assert the single physical build instead of the
    // pre-r18 per-flag join-output names
    assertSingleHitSetBuild(bucketedForm)
    val plan = flatten(bucketedForm.queryExecution.executedPlan)
    val pkJoins = plan.collect { case j: BroadcastHashJoinExec => j }
      .filter(_.right.output.exists(_.name == "__hit"))
    assert(pkJoins.size >= 2,
      s"expected both flag attaches to read the fused __pk broadcast, " +
        s"got ${pkJoins.size}")
    // (the candidate-side exchange control is inside
    // assertStandingSideColocated — per probe)
  }

  test("the bucketed nightly-cycle composition ≡ the broadcast cycle, " +
      "standing sides exchange-free, no standing-key broadcast anywhere") {
    val (canonIdx, textIdx) = Corpus.webCorpusIndexes(standing)
    val (bc, bt) = bucketedIdx
    def rows(df: DataFrame) = df.collect()
      .map(r => (Option(r.get(1)), r.getString(0), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .sortBy(_.toString)
    val broadcastCycle = Corpus.webCorpusNightlyCycle(canonIdx, textIdx, batch)
    val bucketedCycle = Corpus.webCorpusNightlyCycleBucketed(bc, bt, batch)
    assert(rows(bucketedCycle) === rows(broadcastCycle).toSeq,
      "the probe swap must be invisible to both halves of the cycle")
    assertStandingSideColocated(bucketedCycle, expectedProbes = 2)
    assertSingleHitSetBuild(bucketedCycle)
  }

  test("bucketed write-back deltas ≡ broadcast deltas through one " +
      "linear probe chain: candidates shuffle once, standing sides never") {
    val (canonIdx, textIdx) = Corpus.webCorpusIndexes(standing)
    val (bc, bt) = bucketedIdx
    val broadcastDeltas = Corpus.webCorpusIndexDelta(canonIdx, textIdx, batch)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val bucketedFrame = Corpus.webCorpusIndexDeltaBucketed(bc, bt, batch)
    val bucketedDeltas = bucketedFrame
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(bucketedDeltas === broadcastDeltas)
    assert(bucketedDeltas.contains(("canon", "https://e/c/9")))

    // 3 sort-merge probes total: the canonical-stage semi probe inside
    // the shared batch stage + the two per-index delta probes
    assertStandingSideColocated(bucketedFrame, expectedProbes = 3)
    // the candidate frame re-keys from (kind,key) to key ONCE — the
    // second delta probe reuses the first's partitioning instead of
    // re-exchanging between the two joins
    val plan = flatten(bucketedFrame.queryExecution.executedPlan)
    val keyOnly = plan.collect {
      case s: ShuffleExchangeExec
        if s.outputPartitioning.toString.contains("key#") &&
          !s.outputPartitioning.toString.contains("kind#") => s
    }
    assert(keyOnly.size === 1,
      s"candidates must shuffle on key exactly once, got ${keyOnly.size}: " +
        keyOnly.map(_.outputPartitioning).mkString(", "))
  }
}
