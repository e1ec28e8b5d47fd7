package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The media tier's incremental dedup (VERDICT r16 #3): a batch of
  * new images probes the MATERIALIZED standing pHash band index —
  * batch side broadcast, standing side streamed off its scan — and
  * every verdict equals the union re-run's restricted to the batch.
  * No standing pixel is re-decoded, no index-sized broadcast or
  * pre-join shuffle exists in the plan.
  */
class MediaDedupIncrementSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: flatten(s.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  test("increment ≡ union re-run restricted to batch, across every " +
      "planted class") {
    val standingHashes = Multimodal
      .averageHash(EntrySupport.phashMedia(spark, dir), size = 8).toDF()
    val batchHashes = Multimodal
      .averageHash(EntrySupport.phashBatchMedia(spark, dir), size = 8).toDF()
    val idx = Multimodal.phashBandIndex(standingHashes, hashBits = 64, bands = 4)

    val got = Multimodal.phashIncrementalDedup(idx, batchHashes,
        hashBits = 64, bands = 4, maxHamming = 2)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // the union law, stated independently: all pairs over
    // standing ∪ batch, a batch image's standing partners are its
    // union partners below 1M, its batch dup flag = any union partner
    // in [1M, itself)
    val unionPairs = Multimodal.phashNearDupPairs(
        standingHashes.unionByName(batchHashes),
        hashBits = 64, bands = 4, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val partnersOf = unionPairs.groupBy(_._2).map { case (b, ps) =>
      b -> ps.map(_._1).toSet }
    val batchRows = batchHashes.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet === batchRows.keySet, "one verdict per batch image")
    batchRows.foreach { case (m, dec) =>
      val (gDec, gStand, gBatch, gKeep) = got(m)
      assert(gDec === dec.toLong)
      val partners = partnersOf.getOrElse(m, Set.empty)
      val expStand = partners.count(_ < 1000000L).toLong
      val expBatch = if (partners.exists(p => p >= 1000000L && p < m)) 1L else 0L
      assert(gStand === expStand, s"standing partners of $m")
      assert(gBatch === expBatch, s"in-batch dup flag of $m")
      assert(gKeep ===
        (if (dec == 1 && expStand == 0L && expBatch == 0L) 1L else 0L),
        s"keep of $m")
    }

    // the planted classes actually occurred
    val copies = got.filter { case (m, _) => m >= 1000000L && m < 2000000L }
    assert(copies.nonEmpty && copies.values.forall {
      case (d, s, _, k) => d == 0L || (s >= 1L && k == 0L) },
      "every decoded exact copy must dup against the standing index")
    val fresh = got.filter { case (m, _) => m >= 3000000L }
    assert(fresh.values.count { case (d, s, b, k) =>
      d == 1L && s == 0L && b == 0L && k == 1L } > 0,
      "fresh out-of-base-space images must be kept")
    assert(got.values.exists { case (d, _, _, k) => d == 0L && k == 0L },
      "the corrupt class must surface as decoded = 0, kept 0")
    assert(got.values.exists { case (_, _, b, _) => b == 1L },
      "some in-batch race must occur (copy vs near-dup of one original)")
  }

  test("day 2: appending the batch's band rows makes tomorrow's probe " +
      "behave exactly like a full index rebuild — the media write-back " +
      "is the index build itself, composable per image") {
    import spark.implicits._
    val standingHashes = Multimodal
      .averageHash(EntrySupport.phashMedia(spark, dir), size = 8).toDF()
    val batchHashes = Multimodal
      .averageHash(EntrySupport.phashBatchMedia(spark, dir), size = 8).toDF()
    // the append: phashBandIndex composes per image, so day-1's
    // write-back is just the batch's own band rows — no anti, no
    // rank, nothing to reconcile
    val idx0 = Multimodal.phashBandIndex(standingHashes, 64, 4)
    val idx1 = idx0.unionByName(Multimodal.phashBandIndex(batchHashes, 64, 4))
    val rebuilt = Multimodal.phashBandIndex(
      standingHashes.unionByName(batchHashes), 64, 4)
    assert(idx1.collect().map(_.toString).sorted.toSeq ===
      rebuilt.collect().map(_.toString).sorted.toSeq,
      "append ≡ rebuild, row for row")

    // day-2 batch: recrawls of day-1's FRESH images (same pattern,
    // new ids +5M) — they must dup against the APPENDED index and
    // sail through the STALE day-0 one
    val day2Media = Tables.documents(spark, dir)
      .filter(col("doc_id") < 2000 && col("doc_id") % 4 === 3 &&
        col("doc_id") % 9 =!= 5)
      .select(col("doc_id")).as[Long]
      .map { o =>
        val bytes = {
          // same construction as the day-1 fresh class (base o%64+64)
          val rgb = new Array[Byte](8 * 8 * 3)
          var i = 0
          while (i < 64) {
            val bright =
              ((i * 144115188075855881L) ^ ((o % 64 + 64) * 2654435761L)) % 97 < 48
            val v: Byte = if (bright) 255.toByte else 0.toByte
            rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
            i += 1
          }
          Multimodal.PpmCodec.encode(Multimodal.PpmCodec.Image(8, 8, rgb))
        }
        Multimodal.MediaRow(o + 5000000L, "image", bytes,
          bytes.length.toLong, "ppm")
      }
    val day2Hashes = Multimodal.averageHash(day2Media, size = 8).toDF()
    val fresh2 = Multimodal.phashIncrementalDedup(idx1, day2Hashes, 64, 4, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(fresh2.nonEmpty && fresh2.values.forall {
      case (nStand, keep) => nStand >= 1L && keep == 0L },
      "recrawls must dup against the appended index")
    // control: against the stale index NO day-2 image has a standing
    // partner (day-1's bases never reached it), so the only dups left
    // are in-batch races among the recrawls themselves — first-of-base
    // recrawls sail through as kept
    val stale2 = Multimodal.phashIncrementalDedup(idx0, day2Hashes, 64, 4, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(stale2.values.forall(_._1 == 0L),
      "control: the stale index must know none of day-1's fresh bases")
    assert(stale2.values.exists(_._2 == 1L),
      "control: first-of-base recrawls sail through the stale index")
  }

  test("the standing index STREAMS: never broadcast, no exchange below " +
      "its probe join, batch side is the build") {
    val idxDf = EntrySupport.mediaBandIdx(spark, dir)
    val batchHashes = Multimodal
      .averageHash(EntrySupport.phashBatchMedia(spark, dir), size = 8).toDF()
    val res = Multimodal.phashIncrementalDedup(idxDf, batchHashes,
      hashBits = 64, bands = 4, maxHamming = 2)
    res.collect()
    val plan = flatten(res.queryExecution.executedPlan)
    def isIdxScan(p: SparkPlan) = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("media_band_idx"))
      case _ => false
    }
    assert(plan.exists(isIdxScan), "the materialized index must be scanned")
    // the index never broadcasts RAW: a broadcast whose lineage
    // includes the index scan must be the batch-bounded per-image
    // aggregate (the standDups flag frame), i.e. sit above a blocking
    // aggregation — never index-cardinality rows
    plan.collect { case b: BroadcastExchangeExec => b }.foreach { b =>
      val sub = flatten(b)
      if (sub.exists(isIdxScan)) {
        assert(sub.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]),
          "a broadcast touching the index lineage must be the " +
            "batch-bounded aggregate, not raw index rows")
      }
    }
    // ...and the probe join STREAMS it (index on the non-build side)
    // with no exchange between its scan and the join. The walk stops
    // at broadcast builds: an idx scan INSIDE a downstream flag
    // join's broadcast build is the aggregated lineage, not a stream.
    def streamedChild(j: BroadcastHashJoinExec): SparkPlan =
      j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        case _ => j.right
      }
    def flattenStreamed(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flattenStreamed(a.executedPlan)
      case _: BroadcastExchangeExec => Seq(p)
      case s: org.apache.spark.sql.execution.adaptive.BroadcastQueryStageExec =>
        Seq(s)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: flattenStreamed(s.plan)
      case other => other +: other.children.flatMap(flattenStreamed)
    }
    val probeJoins = plan.collect {
      case j: BroadcastHashJoinExec
        if flattenStreamed(streamedChild(j)).exists(isIdxScan) => j
    }
    assert(probeJoins.nonEmpty,
      "expected the band-probe join to stream the standing index")
    probeJoins.foreach { j =>
      assert(!flattenStreamed(streamedChild(j))
        .exists(_.isInstanceOf[ShuffleExchangeExec]),
        "the standing index must stream off its scan, never shuffle:\n" + j)
    }
  }
}
