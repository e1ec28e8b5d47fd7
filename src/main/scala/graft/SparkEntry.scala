package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Corpus, Dedup, EventOps, Multimodal, Mutations, Relational, Sim, Text, TimeFns}
import graft.etl.Sinks
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §2.12 for the declared
  * query inventory. Every query is deterministic: total ORDER BY on a
  * unique key, doubles rounded, timestamps emitted as epoch-micros
  * bigints or formatted strings (never raw timestamp columns — the
  * testdata's TIMESTAMP(NANOS) physical type has no loss-free common
  * representation between Spark and the DuckDB oracle).
  */
object SparkEntry {

  /** Some session configs (nanos-as-long, UTC) must be set even when the
    * harness builds the SparkSession itself — they are session-scoped
    * SQLConf entries, so set-at-runtime works.
    */
  private def ensure(s: SparkSession): SparkSession = {
    Tables.sessionConfigs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  /** Layout version for materialized scratch dirs: bump whenever the
    * written schema/partitioning changes so a later round never reads
    * a stale layout from a previous round's run.
    */
  private val qtmpVersion = "v2"

  private def tmpDir(tag: String, sfDir: String): String = {
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/qtmp/$qtmpVersion/${tag}_$sf"
  }

  /** Flagship: the reference's core extraction pipeline (SURVEY §7.2) on
    * sf0.001 — scan → non-null user filter → tracked-event IN-list →
    * params extraction → natural-key first-write dedup → time order.
    * Mirrors `/root/reference/extract_bq.py:86-117` + `:155-165`.
    */
  def entry(spark: SparkSession): DataFrame = {
    val s = ensure(spark)
    val ev = Tables.events(s, "/root/testdata/sf0.001")
    val tracked = Seq("click", "view", "purchase", "signup", "error")
    val filtered = EventOps.filterIn(EventOps.filterNonNull(ev), tracked)
    val extracted = EventOps.extractJsonLong(filtered, "props", "k", "param_k")
    EventOps
      .dedupFirstWrite(extracted, Seq("user_id", "ts_us", "event_type"), "ts_us", "event_id")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("param_k"))
      .orderBy(col("ts_us"), col("event_id"))
  }

  // ---------------------------------------------------------------------------
  // Query bodies. Keys match SURVEY.md §2.12 exactly.
  // ---------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- batch 1: parity core ------------------------------------------------
    "q_scan_events" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).select(
        col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value_r"), col("props"))
        .orderBy(col("event_id"))
    }),

    "q_prune_dates" -> ((s0, dir) => {
      val s = ensure(s0)
      // Materialize the date-partitioned layout once (the reference's
      // sharded events_YYYYMMDD family), then filter on the PARTITION
      // column: the scan's PartitionFilters prune whole day-directories
      // at planning time — at 100 TB this is the difference between
      // reading 10 days and reading 10 years.
      val part = tmpDir("events_by_date", dir)
      Sinks.ensurePartitioned(
        Tables.events(s, dir).withColumn(
          "event_date", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd")),
        part, "event_date")
      s.read.parquet(part)
        .filter(col("event_date") >= "2024-01-10" && col("event_date") < "2024-01-20")
        .select(col("event_id"), col("ts_us"), col("event_date").cast("string").as("event_date"))
        .orderBy(col("event_id"))
    }),

    "q_project" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.project(Tables.events(s, dir)).orderBy(col("event_id"))
    }),

    "q_filter_nonnull" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.filterNonNull(Tables.events(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_filter_in" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.filterIn(Tables.events(s, dir), Seq("click", "view", "purchase"))
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_filter_gt_watermark" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.newerThan(Tables.events(s, dir), D2024_01_15_US)
        .select(col("event_id"), col("ts_us"))
        .orderBy(col("event_id"))
    }),

    "q_params_extract" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.extractJsonLong(Tables.events(s, dir), "props", "k", "param_k")
        .select(col("event_id"), col("user_id"), col("param_k"))
        .orderBy(col("event_id"))
    }),

    "q_sort_desc" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).select(col("event_id"), col("ts_us"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
    }),

    "q_sort_asc" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).select(col("event_id"), col("ts_us"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
    }),

    "q_topk" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir)
        .orderBy(col("value").desc, col("event_id").asc)
        .limit(100)
        .select(col("event_id"), round(col("value"), 4).as("value_r"))
    }),

    "q_agg_max" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).agg(max(col("ts_us")).as("max_ts_us"))
    }),

    "q_agg_count" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).agg(count(lit(1)).as("n_rows"))
    }),

    "q_agg_group" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 4).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_agg_distinct" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.distinctUsersPerType(Tables.events(s, dir))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_rollup" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.rollupTypeDate(Tables.events(s, dir))
        .orderBy(col("event_type").asc_nulls_first, col("event_date").asc_nulls_first)
    }),

    "q_dedup_key" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.dedupFirstWrite(
        Tables.events(s, dir), Seq("user_id", "event_type"), "ts_us", "event_id")
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts_us"))
        // explicit null placement: Spark asc defaults NULLS FIRST but
        // DuckDB defaults NULLS LAST — pin both sides (user_id is nullable)
        .orderBy(col("user_id").asc_nulls_first, col("event_type").asc_nulls_first)
    }),

    "q_upsert_anti" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir)
      val existing = ev.filter(col("event_id") % 3 === 0)
      val incoming = EventOps.newerThan(ev, D2024_01_15_US)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      EventOps.newKeysOnly(incoming, existing, Seq("user_id", "ts_us", "event_type"))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_union" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      val a = ev.filter(col("ts_us") < D2024_01_10_US)
      val b = ev.filter(col("ts_us") >= D2024_01_10_US && col("ts_us") < D2024_01_20_US)
      a.unionByName(b).orderBy(col("event_id"))
    }),

    "q_incremental" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      // Phase 1: everything up to the split; its max ts becomes the
      // persisted watermark (a driver-side SCALAR read, mirroring the
      // reference checkpoint file — never a join against history).
      val batch1 = ev.filter(col("ts_us") <= D2024_01_15_US)
      val wmRow = batch1.agg(max(col("ts_us"))).head()
      val wm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
      // Phase 2: strictly newer than the watermark.
      val batch2 = ev.filter(col("ts_us") > wm)
      batch1.unionByName(batch2).orderBy(col("event_id"))
    }),

    "q_sink_csv" -> ((s0, dir) => {
      val s = ensure(s0)
      // repartition BEFORE the json extraction: the cached events table
      // is one partition, and both the per-row json parse and the CSV
      // text serialization would otherwise run on a single core
      val out = EventOps.extractJsonLong(
          Tables.events(s, dir).repartition(8), "props", "k", "param_k")
        .select(
          col("event_id"), col("user_id"),
          date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("event_date"),
          col("ts_us"), col("event_type"), col("param_k"))
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_date", StringType), StructField("ts_us", LongType),
        StructField("event_type", StringType), StructField("param_k", LongType)))
      Sinks.csvRoundTrip(out, tmpDir("csv", dir), schema)
        .orderBy(col("event_id"))
    }),

    "q_sink_append" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      val sink = tmpDir("append", dir)
      Sinks.overwrite(ev.filter(col("ts_us") < D2024_01_15_US), sink)
      Sinks.append(ev.filter(col("ts_us") >= D2024_01_15_US), sink)
      s.read.parquet(sink).orderBy(col("event_id"))
    }),

    // ---- batch 2: capability closure ----------------------------------------
    "q_join_inner" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.ordersWithCustomer(Tables.orders(s, dir), Tables.customer(s, dir))
        .select(col("o_orderkey"), col("c_name"), round(col("o_totalprice"), 4).as("total_r"))
        .orderBy(col("o_orderkey"))
    }),

    "q_join_left" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.lineitemWithPart(Tables.lineitem(s, dir), Tables.part(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("p_name"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
        // l_partkey added so every output column is determined by the sort key.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    }),

    "q_join_semi" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.customersWithOrders(Tables.customer(s, dir), Tables.orders(s, dir))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q_window_rank" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.rankPerUser(Tables.events(s, dir))
        .orderBy(col("user_id").asc_nulls_first, col("rn"))
    }),

    "q_window_lag" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.interEventGap(Tables.events(s, dir))
        .orderBy(col("user_id").asc_nulls_first, col("ts_us"), col("event_id"))
    }),

    "q_window_tumbling" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.hourlyCounts(Tables.events(s, dir))
        .orderBy(col("win_start"), col("event_type").asc_nulls_first)
    }),

    "q_date_parse" -> ((s0, dir) => {
      val s = ensure(s0)
      val ts = timestamp_micros(col("ts_us"))
      val raw = when(col("event_id") % 4 === 0, date_format(ts, "yyyy-MM-dd"))
        .when(col("event_id") % 4 === 1, date_format(ts, "yyyy/MM/dd"))
        .when(col("event_id") % 4 === 2, date_format(ts, "dd-MM-yyyy"))
        .otherwise(date_format(ts, "dd/MM/yyyy"))
      Tables.events(s, dir)
        .withColumn("raw", raw)
        .select(
          col("event_id"), col("raw"),
          date_format(TimeFns.parseMultiFormat(col("raw")), "yyyy-MM-dd").as("parsed"))
        .orderBy(col("event_id"))
    }),

    "q_date_format" -> ((s0, dir) => {
      val s = ensure(s0)
      val ts = timestamp_micros(col("ts_us"))
      Tables.events(s, dir).select(
        col("event_id"),
        TimeFns.toSuffix(ts).as("ymd"),
        TimeFns.toIso(ts).as("iso"))
        .orderBy(col("event_id"))
    }),

    "q_date_arith" -> ((s0, dir) => {
      val s = ensure(s0)
      TimeFns.dateKitchenSink(Tables.events(s, dir))
        .select(col("event_id"), col("minus_7d"), col("plus_36h"), col("days_since"))
        .orderBy(col("event_id"))
    }),

    "q_epoch_micros" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).select(
        col("event_id"),
        col("ts_us"),
        date_format(TimeFns.microsToTs(col("ts_us")), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        TimeFns.tsToMicros(TimeFns.microsToTs(col("ts_us"))).as("roundtrip_us"))
        .orderBy(col("event_id"))
    }),

    "q_string_fns" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.stringKitchenSink(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    // ---- batch 3: LLM-pipeline extensions -----------------------------------
    "q_dedup_exact" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.exactDedup(Tables.documents(s, dir)).orderBy(col("keep_id"))
    }),

    "q_text_tokens" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tokenFrequencies(Tables.documents(s, dir))
        .orderBy(col("freq").desc, col("token"))
    }),

    "q_heavy_hitters" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.heavyHitters(Tables.documents(s, dir), support = 0.02)
        .orderBy(col("token"))
    }),

    "q_text_stats" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.corpusStats(Tables.documents(s, dir)).orderBy(col("lang"), col("source"))
    }),

    "q_sim_cosine_topk" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.cosineTopK(Tables.embeddings(s, dir), nQueries = 10, k = 5)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // ---- batch 4: training-data-pipeline operators --------------------------
    // The documents corpus has no natural near-duplicates, so the dedup
    // queries construct them: every doc is unioned with a perturbed
    // (suffix-appended) or exact copy at doc_id + 100000. The
    // construction is pure relational algebra, mirrored in the oracle,
    // so the operators are exercised against known-positive pairs.
    "q_dedup_ngram" -> ((s0, dir) => {
      val s = ensure(s0)
      // EXACT pairwise Jaccard is the quadratic-cost ground truth — run
      // on a bounded block (doc_id < 2000, like the embedding-pair
      // cap). The unbounded scale path is q_dedup_minhash: LSH gives
      // sub-quadratic candidates, and exact J is then only computed per
      // candidate pair.
      Dedup.ngramJaccardPairs(perturbedCorpus(s, dir, cap = 2000), threshold = 0.7)
        .orderBy(col("a"), col("b"))
    }),

    "q_dedup_minhash" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.minhashLshCandidates(perturbedCorpus(s, dir), numHashes = 16, bands = 4)
        .orderBy(col("a"), col("b"))
    }),

    "q_dedup_minhash_est" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.minhashJaccardEstimates(perturbedCorpus(s, dir, cap = 2000))
        .orderBy(col("a"), col("b"))
    }),

    "q_dedup_pipeline" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.lshDedupKeepers(perturbedCorpus(s, dir, cap = 2000), minJaccard = 0.7)
        .orderBy(col("doc_id"))
    }),

    "q_dedup_simhash" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.simhashClusters(exactDupCorpus(s, dir))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_embed" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), cap = 500, n = 50)
    }),

    "q_sim_ann" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.cosineTopKIvf(Tables.embeddings(s, dir), nQueries = 10, k = 5, nCells = 8)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_lang_id" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.languageId(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_lang_id_ngram" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.languageIdCharNgram(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_quality_score" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.qualityScore(Tables.documents(s, dir), Seq("the", "a"))
        .orderBy(col("doc_id"))
    }),

    "q_token_count" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tokenCounts(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_fingerprint" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.fingerprints(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_agg_stats" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 4).as("sd_value"),
          round(var_samp(col("value")), 4).as("var_value"),
          round(min(col("value")), 4).as("min_value"),
          round(max(col("value")), 4).as("max_value"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_percentile" -> ((s0, dir) => {
      val s = ensure(s0)
      // Exact interpolated percentiles (both engines use linear
      // interpolation). At 100 TB swap for approx_percentile
      // (t-digest-style sketch, single pass, mergeable) — same
      // substitution contract as approxDistinctUsersPerType.
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_above_avg" -> ((s0, dir) => {
      val s = ensure(s0)
      // Scalar subquery through Catalyst's subquery rewriting (not a
      // driver-side collect): events with value above the global mean.
      Tables.events(s, dir).createOrReplaceTempView("ev_sub")
      s.sql(
        """SELECT event_id, round(value, 4) AS value_r FROM ev_sub
          |WHERE value > (SELECT avg(value) FROM ev_sub)
          |ORDER BY event_id""".stripMargin)
    }),

    "q_cube" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir)
        .withColumn("event_date", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
        .cube(col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first, col("event_date").asc_nulls_first)
    }),

    "q_join_full" -> ((s0, dir) => {
      val s = ensure(s0)
      // Both sides partially unmatched so the FULL OUTER shape is real:
      // low custkeys exist only on the customer side, high ones only in
      // the per-customer order rollup.
      val a = Tables.customer(s, dir)
        .filter(col("c_custkey") <= 700).select(col("c_custkey"), col("c_name"))
      val b = Tables.orders(s, dir)
        .filter(col("o_custkey") >= 300)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      a.join(b, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
        .orderBy(col("custkey"))
    }),

    "q_window_moving" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("ts_us"),
        round(avg(col("value")).over(w), 4).as("mov_avg"))
        .orderBy(col("user_id").asc_nulls_first, col("ts_us"), col("event_id"))
    }),

    "q_sessionize" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      // Gap-based sessionization: a >30-minute silence starts a new
      // session; session index = running count of session starts. The
      // streaming twin is session_window(ts, "30 minutes").
      val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(byTime))
        .withColumn("new_session",
          when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("session_idx"))
        .orderBy(col("user_id").asc_nulls_first, col("ts_us"), col("event_id"))
    }),

    "q_profile" -> ((s0, dir) => {
      val s = ensure(s0)
      // Single-pass data-quality profile: one aggregation computes
      // null counts, ranges, and exact distincts for the whole table —
      // the intake check a pipeline runs before trusting a new drop.
      Tables.events(s, dir).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user"),
        sum(when(col("props").isNull || col("props") === "", 1L).otherwise(0L)).as("empty_props"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"))
    }),

    "q_pivot" -> ((s0, dir) => {
      val s = ensure(s0)
      // Pivot long→wide: per user, one count column per event type.
      // The type vocabulary is supplied explicitly — at scale an
      // unspecified pivot triggers an extra distinct-values job.
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy(col("user_id").asc_nulls_first)
    }),

    "q_grouping_sets" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.events(s, dir)
        .withColumn("event_date", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("event_date"))),
          col("event_type"), col("event_date"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type").asc_nulls_first, col("event_date").asc_nulls_first)
    }),

    "q_session_window" -> ((s0, dir) => {
      val s = ensure(s0)
      // Native session_window operator: events merge while gaps stay
      // under 30 minutes; window end = last event + gap. The oracle
      // reproduces the same sessions from first principles (lag +
      // running session index).
      Tables.events(s, dir)
        .withColumn("ts_ts", timestamp_micros(col("ts_us")))
        .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          col("n"))
        .orderBy(col("user_id").asc_nulls_first, col("sess_start"))
    }),

    "q_media_meta" -> ((s0, dir) => {
      val s = ensure(s0)
      Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        expr("element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1)")
          .as("kind"),
        expr("octet_length(cast(text as binary))").cast("long").as("n_bytes"),
        substring(hex(col("text").cast("binary")), 1, 16).as("head_hex"),
        expr(
          """array_join(transform(sequence(0, 2),
            |  i -> md5(cast(substring(text, 1 + i * (length(text) div 3),
            |                          (length(text) div 3)) as binary))), '-')""".stripMargin)
          .as("frames_sig"))
        .orderBy(col("media_id"))
    }),

    // ---- batch 5 (round 3): transitive dedup, GA4 nested shape, trained IVF --
    "q_dedup_cc" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.connectedComponentKeepers(chainCorpus(s, dir, cap = 500), minJaccard = 0.7)
        .orderBy(col("doc_id"))
    }),

    "q_ga4_extract" -> ((s0, dir) => {
      val s = ensure(s0)
      // The reference's real N1 shape, oracle-checked end to end:
      // ARRAY<STRUCT> scan from parquet → HOF filter + try_element_at(-1)
      // (last-match-wins, null-array-safe). The oracle states the
      // expected values from first principles (it knows how the table
      // was derived), so the nested extraction is independently checked.
      ga4Table(s, dir)
        .select(
          col("event_id"),
          EventOps.extractParam(col("event_params"), "k").as("param_k"),
          EventOps.extractParam(col("event_params"), "page").as("page"))
        .orderBy(col("event_id"))
    }),

    "q_sim_ann_kmeans" -> ((s0, dir) => {
      val s = ensure(s0)
      // sampleMod=2: the coarse quantizer trains on every 2nd vector
      // (~125·nCells training points — faiss-style bounded sample)
      Sim.cosineTopKIvfKmeans(Tables.embeddings(s, dir),
        nQueries = 10, k = 5, nCells = 8, iters = 4, nProbe = 2, sampleMod = 2)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_sim_ann_pq" -> ((s0, dir) => {
      val s = ensure(s0)
      // IVF-PQ: trained cells + per-subspace product quantization —
      // the billion-scale ANN configuration (candidates scored against
      // m-byte code reconstructions, not raw vectors). dim 64, m=8 →
      // 8-dim subspaces × 16 codes; same coarse quantizer as
      // q_sim_ann_kmeans.
      Sim.cosineTopKIvfPq(Tables.embeddings(s, dir),
        nQueries = 10, k = 5, nCells = 8, m = 8, ks = 16, iters = 4,
        nProbe = 2, sampleMod = 2)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_sim_ann_pq_refine" -> ((s0, dir) => {
      val s = ensure(s0)
      // The production two-stage shape: PQ codes shortlist 20
      // candidates per query, full vectors rescore only the shortlist
      // (faiss IndexRefine). Oracle recomputes BOTH stages.
      Sim.cosineTopKIvfPq(Tables.embeddings(s, dir),
        nQueries = 10, k = 5, nCells = 8, m = 8, ks = 16, iters = 4,
        nProbe = 2, sampleMod = 2, refine = 20)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_dedup_semantic" -> ((s0, dir) => {
      val s = ensure(s0)
      // SemDeDup: cluster-bounded embedding near-dup keepers. Same
      // trained quantizer configuration as q_sim_ann_kmeans; the 0.40
      // threshold is tuned to this synthetic table's cosine range
      // (top pairs ~0.5-0.6) so the pair/keeper path is exercised —
      // production text embeddings use ~0.95+ (the paper's range).
      Sim.semanticDedupKeepers(Tables.embeddings(s, dir),
        nCells = 8, iters = 4, sampleMod = 2, minCos = 0.40)
        .orderBy(col("vec_id"))
    }),

    // ---- batch 6 (round 4): as-of/range joins, reshape, corpus assembly -----
    "q_asof_join" -> ((s0, dir) => {
      val s = ensure(s0)
      // Last purchase at-or-before each click, per user — the
      // attribution/funnel join. One shuffle + sort (merge-asof form),
      // never the |clicks|x|purchases-per-user| expansion.
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      Relational.asofJoin(clicks, purchases, "user_id", "ts_us", "event_id",
          Seq("ts_us", "event_id"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("asof.ts_us").as("p_ts_us"), col("asof.event_id").as("p_event_id"))
        .orderBy(col("event_id"))
    }),

    "q_range_join" -> ((s0, dir) => {
      val s = ensure(s0)
      // Events into overlapping 36h maintenance windows (one per day):
      // bin-equi-join + residual filter, not a nested-loop inequality join.
      val day = 86400000000L
      val start = 1704412800000000L // 2024-01-05 00:00 UTC, micros
      val win = s.range(20).select(
        col("id").as("win_id"),
        (lit(start) + col("id") * day).as("lo"),
        (lit(start) + col("id") * day + 36L * 3600000000L).as("hi"))
      Relational.rangeJoinBinned(
          Tables.events(s, dir).select(col("event_id"), col("ts_us")),
          "ts_us", win, "lo", "hi", day)
        .select(col("event_id"), col("win_id"), col("ts_us"))
        .orderBy(col("event_id"), col("win_id"))
    }),

    "q_unpivot" -> ((s0, dir) => {
      val s = ensure(s0)
      // Wide→long reshape (melt): stack() emits 4 rows per input row in
      // one codegen'd projection — no join, no shuffle, no UDF.
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 10 === 0)
        .selectExpr("l_orderkey", "l_linenumber", "l_partkey",
          """stack(4,
            |  'discount', round(l_discount, 4),
            |  'extendedprice', round(l_extendedprice, 4),
            |  'quantity', round(l_quantity, 4),
            |  'tax', round(l_tax, 4)) AS (metric, val)""".stripMargin)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("metric"), col("val"))
    }),

    "q_user_paths" -> ((s0, dir) => {
      val s = ensure(s0)
      // Per-user ordered journey string: collect_list into an
      // array_sort'd struct (ts, id, type) — deterministic without a
      // pre-shuffle sort, one aggregation exchange total.
      Tables.events(s, dir).filter(col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")), ">").as("path"))
        .orderBy(col("user_id"))
    }),

    "q_pii_mask" -> ((s0, dir) => {
      val s = ensure(s0)
      // Deterministic PII is injected (testdata has none), then redacted
      // by the map-side regex pass — both halves mirrored in the oracle.
      val raw = concat(substring(col("text"), 1, 120),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
      Tables.documents(s, dir)
        .select(col("doc_id"), graft.ops.Corpus.piiMask(raw).as("masked"))
        .orderBy(col("doc_id"))
    }),

    "q_quality_gopher" -> ((s0, dir) => {
      val s = ensure(s0)
      graft.ops.Corpus.gopherSignals(Tables.documents(s, dir))
        .orderBy(col("doc_id"))
    }),

    "q_pack_sequences" -> ((s0, dir) => {
      val s = ensure(s0)
      graft.ops.Corpus.packSequences(Tables.documents(s, dir), shardSize = 64, budget = 2048)
        .orderBy(col("doc_id"))
    }),

    "q_shuffle_shard" -> ((s0, dir) => {
      val s = ensure(s0)
      graft.ops.Corpus.shuffleShard(Tables.documents(s, dir), nShards = 8)
        .orderBy(col("doc_id"))
    }),

    "q_dedup_contain" -> ((s0, dir) => {
      val s = ensure(s0)
      // Containment on the CHAIN corpus: every prefix-truncated copy
      // has shingles nested inside its original, so cont≈1 while
      // Jaccard is only the length ratio — exactly the asymmetric
      // case Jaccard-threshold dedup misses.
      Dedup.ngramContainmentPairs(chainCorpus(s, dir, cap = 500), threshold = 0.9)
        .orderBy(col("a"), col("b"))
    }),

    "q_outliers" -> ((s0, dir) => {
      val s = ensure(s0)
      // Z-score anomaly flagging: per-type moments once, broadcast
      // back against the stream — the stats-join-back intake check
      // (contrast q_above_avg's single global scalar subquery).
      val ev = Tables.events(s, dir)
      val stats = ev.groupBy(col("event_type")).agg(
        avg(col("value")).as("__mu"), stddev_samp(col("value")).as("__sd"))
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("z", (col("value") - col("__mu")) / col("__sd"))
        .filter(abs(col("z")) > 2.5)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value_r"), round(col("z"), 4).as("z_r"))
        .orderBy(col("event_id"))
    }),

    "q_corr" -> ((s0, dir) => {
      val s = ensure(s0)
      // Bivariate stats per group: correlation and sample covariance
      // between the metric and the extracted numeric param — one
      // partial-aggregated pass (corr/covar state is a fixed tuple of
      // moments, mergeable like any sketch).
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
        .filter(col("k").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(corr(col("value"), col("k")), 4).as("corr_vk"),
          round(covar_samp(col("value"), col("k")), 4).as("covar_vk"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_retention" -> ((s0, dir) => {
      val s = ensure(s0)
      // Cohort retention: users grouped by first-seen week, counted in
      // each later week they were active. Two aggregations + one join
      // on user — the cohort table is groups-sized, so at scale it
      // broadcasts back against per-user activity.
      val weekUs = 7L * 86400000000L
      val base = 1704067200000000L // 2024-01-01
      val wk = ((col("ts_us") - base) / weekUs).cast("long")
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), wk.as("wk"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      val active = ev.distinct()
      active.join(broadcast(cohorts), Seq("user_id"))
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("wk_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort"), col("wk_offset"))
    }),

    "q_histogram" -> ((s0, dir) => {
      val s = ensure(s0)
      // Fixed-width binned distribution — the intake profile's
      // histogram twin. Bin id is computed map-side; one aggregation.
      Tables.events(s, dir)
        .select(floor(col("value") / 25.0).cast("long").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"))
        .withColumn("lo", round(col("bin") * 25.0, 4))
        .orderBy(col("bin"))
    }),

    "q_drift" -> ((s0, dir) => {
      val s = ensure(s0)
      // Distribution drift between two periods, one scan: conditional
      // counts per type, shares against period totals (broadcast back),
      // absolute share delta as the drift signal.
      val side = when(col("ts_us") < D2024_01_10_US, "a")
        .when(col("ts_us") < D2024_01_20_US, "b")
      val tagged = Tables.events(s, dir).withColumn("side", side)
        .filter(col("side").isNotNull)
      val perType = tagged.groupBy(col("event_type")).agg(
        sum(when(col("side") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_b"))
      val totals = perType.agg(
        sum(col("n_a")).cast("double").as("__ta"),
        sum(col("n_b")).cast("double").as("__tb"))
      perType.crossJoin(broadcast(totals))
        .select(
          col("event_type"), col("n_a"), col("n_b"),
          round(col("n_a") / col("__ta"), 4).as("share_a"),
          round(col("n_b") / col("__tb"), 4).as("share_b"),
          round(abs(col("n_a") / col("__ta") - col("n_b") / col("__tb")), 4).as("drift"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_tfidf" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tfidfTopTerms(Tables.documents(s, dir), k = 3)
        .orderBy(col("doc_id"), col("rnk"))
    }),

    "q_unigram_logprob" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.unigramLogProb(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_funnel" -> ((s0, dir) => {
      val s = ensure(s0)
      // click → view → purchase progression per user: one shuffle +
      // map-side fold, vs the oracle's per-step self-join form.
      EventOps.funnelStages(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "ts_us", "event_type", Seq("click", "view", "purchase"))
        .orderBy(col("user_id"))
    }),

    "q_corpus_pipeline" -> ((s0, dir) => {
      val s = ensure(s0)
      // The composed corpus build — exact dedup → Gopher gate →
      // deterministic per-domain sampling → sequence packing, one lazy
      // plan, two shuffles total. The flagship of the training-data
      // toolbox; every stage is the same operator the standalone
      // queries exercise.
      graft.ops.Corpus.buildCorpus(
          Tables.documents(s, dir).select(col("doc_id"), col("text"), col("lang")),
          "lang", Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1),
          shardSize = 64, budget = 2048)
        .orderBy(col("doc_id"))
    }),

    "q_decontaminate" -> ((s0, dir) => {
      val s = ensure(s0)
      // Benchmark decontamination: the eval set is every 97th doc; the
      // training set additionally contains a perturbed near-copy of
      // each eval doc (suffix noise) — exactly the leakage an n-gram
      // overlap check must catch even though the copies aren't exact.
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val train = docs
        .unionByName(bench.select(
          (col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" zz9 zz9")).as("text")))
        .repartition(s.sparkContext.defaultParallelism)
      graft.ops.Corpus.decontaminate(train, bench, minShared = 5)
        .orderBy(col("doc_id"))
    }),

    "q_sample_weighted" -> ((s0, dir) => {
      val s = ensure(s0)
      // Reproducible domain mixing: per-language sampling weights,
      // hash-threshold draw (no RNG state, same verdict every run);
      // zh has no weight listed → dropped entirely.
      graft.ops.Corpus.weightedSample(Tables.documents(s, dir),
          "lang", Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1))
        .select(col("doc_id"), col("lang"), col("u_r"))
        .orderBy(col("doc_id"))
    }),

    "q_window_range" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      // RANGE frame (value-based, not row-based): trailing 1-hour sum
      // per user — rows at equal ts share one frame, and gaps in time
      // shrink the window. Complements the ROWS frames in
      // q_window_moving.
      val hourUs = 3600000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-hourUs, Window.currentRow)
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"), col("ts_us"),
        round(sum(col("value")).over(w), 4).as("hour_sum"))
        .orderBy(col("user_id").asc_nulls_first, col("ts_us"), col("event_id"))
    }),

    "q_argmax" -> ((s0, dir) => {
      val s = ensure(s0)
      // Argmax aggregates: per event type, WHICH event carried the
      // max/min value (max_by/min_by, one aggregation pass — no
      // self-join back against the max). Ties broken deterministically
      // by taking the larger (event_id-tagged) struct.
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          max_by(col("event_id"), struct(col("value"), col("event_id"))).as("max_event_id"),
          min_by(col("event_id"), struct(col("value"), col("event_id"))).as("min_event_id"),
          round(max(col("value")), 4).as("max_value"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    "q_sink_json" -> ((s0, dir) => {
      val s = ensure(s0)
      // Third format surface: newline-delimited JSON out, schema'd read
      // back (inference would cost an extra pass and can widen types).
      val out = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        round(col("value"), 4).as("value_r"))
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value_r", DoubleType)))
      Sinks.jsonRoundTrip(out, tmpDir("json", dir), schema).orderBy(col("event_id"))
    }),

    "q_sink_orc" -> ((s0, dir) => {
      val s = ensure(s0)
      // Fourth format surface: ORC out + schema'd read back — same
      // columnar pushdown class as parquet, different container.
      val out = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        round(col("value"), 4).as("value_r"))
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("ts_us", LongType), StructField("event_type", StringType),
        StructField("value_r", DoubleType)))
      Sinks.orcRoundTrip(out, tmpDir("orc", dir), schema).orderBy(col("event_id"))
    }),

    "q_levenshtein" -> ((s0, dir) => {
      val s = ensure(s0)
      // Edit distance between doc_id-adjacent 40-char prefixes: the
      // exact string-similarity verifier that runs on LSH candidate
      // pairs at scale (here on a deterministic 1:1 pairing).
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("s40"))
      d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.doc_id").as("doc_id"),
          levenshtein(col("a.s40"), col("b.s40")).cast("long").as("dist"))
        .orderBy(col("doc_id"))
    }),

    // ---- batch 7 (round 5): LM scoring, vocab training, chunking, ----------
    // ---- balancing, attribution, media planning, equal-count bands ----------
    "q_bigram_lm" -> ((s0, dir) => {
      val s = ensure(s0)
      // scan fan-out (same rationale as perturbedCorpus): the corpus
      // parquet is a single split, and the bigram explode runs TWICE
      // (lookup build + instance stream) before any exchange — spread
      // it instead of serializing both passes onto one core
      Text.bigramLogProb(
          Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism))
        .orderBy(col("doc_id"))
    }),

    "q_bpe_pairs" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.bpePairCounts(Tables.documents(s, dir), k = 30)
        .orderBy(col("cnt").desc, col("pair"))
    }),

    "q_chunk_docs" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.chunkDocs(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          chunkSize = 200, overlap = 50)
        .select(col("doc_id"), col("chunk_id"), col("off"), col("chunk_len"),
          substring(col("chunk"), 1, 16).as("chunk_head"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "q_domain_cap" -> ((s0, dir) => {
      val s = ensure(s0)
      // balance the corpus: top-100 docs per source by the same
      // quality score q_quality_score checks, deterministic tiebreak
      val q = Text.qualityScore(Tables.documents(s, dir), Seq("the", "a"))
        .select(col("doc_id"), col("quality"))
      val withSrc = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .join(q, Seq("doc_id"))
      Corpus.domainCap(withSrc, "source", "quality", cap = 100)
        .select(col("doc_id"), col("source"), col("quality"), col("rnk"))
        .orderBy(col("doc_id"))
    }),

    "q_attribution" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.lastTouchAttribution(
          Tables.events(s, dir), "ts_us", "event_type",
          touchType = "click", convType = "purchase")
        .orderBy(col("event_id"))
    }),

    "q_media_chunks" -> ((s0, dir) => {
      val s = ensure(s0)
      Multimodal.chunkPlan(
          Multimodal.mediaFromDocuments(Tables.documents(s, dir)).toDF()
            .select(col("media_id"), col("n_bytes")),
          chunkBytes = 100L)
        .orderBy(col("media_id"), col("chunk_idx"))
    }),

    "q_ntile" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.ntileStats(
          Tables.orders(s, dir), "o_totalprice", "o_orderkey", n = 10)
        .orderBy(col("tile"))
    }),

    "q_split" -> ((s0, dir) => {
      val s = ensure(s0)
      // 90/5/5 deterministic split; emit the per-split counts per lang
      // so the oracle checks both assignment AND stratum proportions
      Corpus.assignSplit(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          Seq(("train", 0.9), ("val", 0.95), ("test", 1.0)))
        .select(col("doc_id"), col("lang"), col("split"), col("u_r"))
        .orderBy(col("doc_id"))
    }),

    "q_window_pct" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      // distribution-position windows: percent_rank (rank-based) and
      // cume_dist (inclusive-count based) per event type — the
      // "where does this value sit" analytics surface q_ntile bands.
      // Scale note: event_type is LOW-cardinality, so each partition
      // is corpus-sized/|types| — one sort per type. At 100 TB compute
      // positions from a binned CDF instead (q_histogram's shape:
      // bin counts + a running sum over the tiny bin table) and keep
      // this exact window for verification samples.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .select(
          col("event_id"), col("event_type"),
          round(col("value"), 4).as("value_r"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("event_id"))
    }),

    "q_stratified_n" -> ((s0, dir) => {
      val s = ensure(s0)
      // exact-40-per-lang unbiased sample (hash-rank) — the fixed-size
      // eval-set draw; contrast q_sample_weighted (expected-size coin
      // flips) and q_domain_cap (quality-biased quota)
      Corpus.stratifiedSampleN(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "lang", n = 40)
        .select(col("doc_id"), col("lang"), col("rnk"))
        .orderBy(col("doc_id"))
    }),

    "q_join_right" -> ((s0, dir) => {
      val s = ensure(s0)
      // RIGHT outer: every customer appears even without orders in the
      // date slice — the mirror of q_join_left, kept as its own row so
      // the join surface is complete left/right/full/semi/anti/inner
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"), "right")
        .select(
          col("c_custkey"), col("c_name"),
          col("o_orderkey"),
          round(col("o_totalprice"), 4).as("price_r"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    }),

    // ---- batch 8: set ops, spine/fill, diversity ----------------------------

    "q_intersect" -> ((s0, dir) => {
      val s = ensure(s0)
      // INTERSECT = distinct set semantics in both engines. Spark plans
      // this as a left-semi join over pre-aggregated sides — the same
      // cost bound as q_join_semi, no row explosion.
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .intersect(
          ev.filter(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    "q_except" -> ((s0, dir) => {
      val s = ensure(s0)
      // EXCEPT (distinct) — signed-up users who never purchased: the
      // set-difference completion of the union/intersect surface.
      // Plans as a left-anti join, mirror of q_upsert_anti.
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "signup").select(col("user_id"))
        .except(
          ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    "q_cross_join" -> ((s0, dir) => {
      val s = ensure(s0)
      // Explicit cartesian of two TINY dims (5×25 rows) — the template
      // expansion shape (every region × every nation scaffold). Spark
      // requires crossJoin to be spelled out, which is the right
      // guard: an accidental cartesian of fact tables at 100 TB is a
      // job-killer, so the API makes intent explicit and the small
      // side broadcasts.
      Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
        .crossJoin(broadcast(
          Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    }),

    "q_window_firstlast" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      // Frame-edge value windows: each event annotated with its user's
      // first, latest-so-far, and second event type. first/nth need the
      // full frame (UNBOUNDED FOLLOWING for last would be the naive
      // form — using the growing frame for "latest so far" keeps the
      // streaming-compatible shape); one shuffle keyed by user_id.
      val wFull = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wGrow = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          first(col("event_type")).over(wGrow).as("first_type"),
          last(col("event_type")).over(wGrow).as("latest_type"),
          nth_value(col("event_type"), 2).over(wFull).as("second_type"))
        .orderBy(col("event_id"))
    }),

    "q_gap_fill" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.gapFillDaily(Tables.events(s, dir), "event_type", "ts_us")
        .orderBy(col("event_type"), col("day"))
    }),

    "q_locf" -> ((s0, dir) => {
      val s = ensure(s0)
      // Deterministic nulls are injected (every third event "dropped
      // its reading"), then repaired by forward fill — both halves
      // mirrored in the oracle. Leading nulls stay null.
      val withGaps = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .withColumn("v_gap",
          when(col("event_id") % 3 === 0, lit(null).cast("double"))
            .otherwise(col("value")))
      Relational.forwardFill(withGaps, "user_id", Seq("ts_us", "event_id"), "v_gap")
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          round(col("v_gap"), 4).as("v_gap_r"),
          round(col("v_gap_fill"), 4).as("v_fill_r"))
        .orderBy(col("event_id"))
    }),

    "q_entropy" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tokenEntropy(Tables.documents(s, dir))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_substring" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.substringDupScores(Tables.documents(s, dir), n = 8)
        .orderBy(col("doc_id"))
    }),

    "q_rolling_distinct" -> ((s0, dir) => {
      val s = ensure(s0)
      // trailing 7-day active users per day — sketch twin
      // Relational.rollingDistinctHllDaily is spec-pinned within 2%
      Relational.rollingDistinctDaily(Tables.events(s, dir), "user_id", "ts_us",
          windowDays = 7)
        .orderBy(col("day"))
    }),

    "q_regex_extract" -> ((s0, dir) => {
      val s = ensure(s0)
      // Pattern extraction over the raw props payload: first integer
      // run, all integer runs, and the match count — the log-scraping
      // primitive (regexp_extract/_all are codegen'd; no UDF). Empty
      // matches normalized to NULL so both engines agree on the
      // no-match representation.
      Tables.events(s, dir)
        .select(
          col("event_id"),
          nullif(regexp_extract(col("props"), "[0-9]+", 0), lit("")).as("first_num"),
          array_join(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)), ",")
            .as("all_nums"),
          size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_nums"))
        .orderBy(col("event_id"))
    }),

    // ---- batch 9: merge/history, index/collocation, intake hygiene ----------

    "q_merge_update" -> ((s0, dir) => {
      val s = ensure(s0)
      // MERGE with update-matched semantics: the pre-watermark profile
      // snapshot merged with the post-watermark re-computation — keys
      // in both take the NEW values (WHEN MATCHED UPDATE), new keys
      // insert, untouched keys keep. Completes the upsert surface next
      // to q_upsert_anti's insert-only conflict-skip.
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      def profile(f: DataFrame): DataFrame = f.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        max(col("ts_us")).as("last_ts_us"),
        round(sum(col("value")), 4).as("sum_v_r"))
      Mutations.mergeUpsert(
          profile(ev.filter(col("ts_us") < D2024_01_15_US)),
          profile(ev.filter(col("ts_us") >= D2024_01_15_US)),
          Seq("user_id"))
        .orderBy(col("user_id"))
    }),

    "q_scd2" -> ((s0, dir) => {
      val s = ensure(s0)
      // Type-2 dimension build from the event stream: per user, each
      // run of consecutive identical event_types is one version row
      // with [valid_from, valid_to) micros and an is_current flag —
      // the "keep history" counterpart of q_merge_update's overwrite.
      Mutations.scd2(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "event_type", "ts_us", "event_id")
        .orderBy(col("user_id"), col("version"))
    }),

    "q_window_median" -> ((s0, dir) => {
      val s = ensure(s0)
      import org.apache.spark.sql.expressions.Window
      // Exact interpolated median over a trailing 5-row frame per user
      // — the robust-smoothing twin of q_window_moving's mean (a single
      // spike moves the mean but not the median). percentile() is an
      // ordered-frame aggregate: per row it sees O(frame)=5 values, so
      // the cost is one user-keyed sort like every other window here.
      // At 100 TB with WIDE frames swap in approx_percentile sketches
      // per tumbling bucket instead (q_window_tumbling's shape).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          round(col("value"), 4).as("value_r"),
          round(expr("percentile(value, 0.5)").over(w), 4).as("med_r"))
        .orderBy(col("event_id"))
    }),

    "q_safe_cast" -> ((s0, dir) => {
      val s = ensure(s0)
      // Intake hygiene: a deterministically-dirtied numeric-string
      // column (N/A markers, empties) re-parsed with try_cast — the
      // malformed-row triage every external feed needs. try_cast is
      // the codegen'd, non-throwing form: bad cells become NULL and
      // are COUNTED per type, never killing the job (ANSI-mode cast
      // would throw on the first 'N/A' at row 3 billion).
      val dirty = when(col("event_id") % 7 === 0, lit("N/A"))
        .when(col("event_id") % 11 === 0, lit(""))
        .otherwise(col("value").cast("string"))
      Tables.events(s, dir)
        .select(col("event_type"), dirty.as("raw"))
        .select(col("event_type"), col("raw"),
          expr("try_cast(raw AS double)").as("parsed"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("parsed").isNull, 1L).otherwise(0L)).as("n_bad"),
          round(avg(col("parsed")), 4).as("avg_ok_r"))
        .orderBy(col("event_type"))
    }),

    "q_text_normalize" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.normalizeText(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    "q_inverted_index" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.invertedIndex(Tables.documents(s, dir), minDf = 2)
        .orderBy(col("token"))
    }),

    "q_pmi" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.bigramPmi(Tables.documents(s, dir), minCount = 5)
        .orderBy(col("w1"), col("w2"))
    }),

    "q_url_parse" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.parseUrls(Tables.documents(s, dir)).orderBy(col("doc_id"))
    }),

    // ---- batch 10: warehouse diagnostics + corpus gates ----------------------
    "q_regression" -> ((s0, dir) => {
      val s = ensure(s0)
      // Per-type linear trend of value over time (days since the
      // watermark epoch) — "is this metric drifting, and how fast".
      Relational.trendPerGroup(
          Tables.events(s, dir).withColumn(
            "x", (col("ts_us") - lit(D2024_01_10_US)) / lit(8.64e10)),
          "event_type", "x", "value")
        .orderBy(col("event_type"))
    }),

    "q_markov" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.transitionMatrix(Tables.events(s, dir), "ts_us", "event_type")
        .orderBy(col("state"), col("next_state"))
    }),

    "q_cooccur" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir).withColumn(
        "day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      EventOps.cooccurrence(ev, Seq(col("user_id"), col("day")), "event_type")
        .orderBy(col("t_a"), col("t_b"))
    }),

    "q_mad_outliers" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.madOutliers(Tables.events(s, dir), "event_type", "value", 3.0)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value_r"),
          round(col("robust_z"), 4).as("robust_z_r"))
        .orderBy(col("event_id"))
    }),

    "q_key_skew" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.keySkewProfile(Tables.events(s, dir), "user_id", 20)
        .orderBy(col("n").desc, col("user_id").asc)
    }),

    "q_reconcile" -> ((s0, dir) => {
      val s = ensure(s0)
      val src = Tables.events(s, dir)
      // sink simulated with a deterministic loss (every 101st event)
      EventOps.reconcile(src, src.filter(col("event_id") % 101 =!= 0), "ts_us")
        .orderBy(col("day"))
    }),

    "q_ewma" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.ewma(
          Tables.events(s, dir).filter(col("user_id").isNotNull),
          "user_id", "ts_us", "event_id", "value", alpha = 0.5, frame = 8)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(col("value"), 4).as("value_r"), col("ewma_r"))
        .orderBy(col("event_id"))
    }),

    "q_length_band" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.lengthBand(Tables.documents(s, dir), "lang", "n_chars", 0.05, 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("len_pr"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    "q_winsorize" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.winsorize(Tables.events(s, dir), "event_type", "value", 0.05, 0.95)
        .select(col("event_id"), col("event_type"),
          round(col("value"), 4).as("value_r"), col("clipped_r"))
        .orderBy(col("event_id"))
    }),

    "q_boilerplate" -> ((s0, dir) => {
      val s = ensure(s0)
      // plant a shared 5-token banner on even docs so the detector has
      // real chrome to find (the corpus itself is near-collision-free)
      // scan fan-out: the md5-per-segment explode precedes the first
      // exchange and the corpus parquet is one split
      val withBanner = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("text",
          when(col("doc_id") % 2 === 0,
            concat(lit("cookie banner terms apply here "), col("text")))
            .otherwise(col("text")))
      Corpus.boilerplate(withBanner, segLen = 5, minDocs = 2)
        .orderBy(col("doc_id"))
    }),

    // ---- batch 11: experimentation + CDC + intake profiling ------------------
    "q_ab_test" -> ((s0, dir) => {
      val s = ensure(s0)
      // conversion = a high-value purchase (plain "any purchase" is
      // degenerate on this data — every user has one)
      EventOps.abTest(Tables.events(s, dir),
        col("event_type") === "purchase" && col("value") > 150)
    }),

    "q_snapshot_diff" -> ((s0, dir) => {
      val s = ensure(s0)
      // old = pre-watermark profile; new = current, with every 53rd
      // user deterministically retired so `removed` rows exist too
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      def profile(f: DataFrame): DataFrame = f.groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_v_r"))
      Mutations.snapshotDiff(
          profile(ev.filter(col("ts_us") < D2024_01_15_US)),
          profile(ev.filter(col("user_id") % 53 =!= 0)),
          Seq("user_id"), Seq("n_events", "sum_v_r"))
        .orderBy(col("user_id"))
    }),

    "q_seasonality" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.seasonality(Tables.events(s, dir), "ts_us")
        .orderBy(col("dow"), col("hod"))
    }),

    "q_json_intake" -> ((s0, dir) => {
      val s = ensure(s0)
      // PERMISSIVE intake of a deliberately-dirty JSONL feed: every
      // 13th line is broken JSON. Malformed LINES route to
      // _corrupt_record (the quarantine column) instead of failing the
      // read; the oracle knows the derivation, so it states the same
      // bucket counts straight from the clean table.
      val feed = tmpDir("dirty_jsonl", dir)
      // feed fan-out: the regenerated events parquet arrives as ONE
      // split, and a single-file JSONL feed would serialize the
      // permissive parse (the whole cost of this query) onto one core
      Sinks.ensureTextWritten(
        Tables.events(s, dir).select(
          when(col("event_id") % 13 === 0, lit("{broken json line"))
            .otherwise(to_json(struct(
              col("event_id"), col("event_type"),
              col("user_id"), col("ts_us")))).as("value"))
          .repartition(s.sparkContext.defaultParallelism),
        feed)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("user_id", LongType), StructField("ts_us", LongType)))
      Sinks.jsonPermissiveRead(s, feed, schema)
        .groupBy(
          when(col("_corrupt_record").isNotNull, lit("corrupt"))
            .otherwise(col("event_type")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    "q_sink_zorder" -> ((s0, dir) => {
      val s = ensure(s0)
      // S8 multi-dim layout, oracle-checked for content losslessness:
      // events written z-ordered on (user_id, ts_us) — the layout that
      // makes 2-d box predicates prune files via parquet min/max — then
      // read back; the oracle is the plain table (a layout changes
      // WHERE bytes live, never WHAT they are). File-locality quality
      // itself is pinned by ZorderSpec's span assertions.
      val out = tmpDir("zorder_events", dir)
      val ev = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Sinks.zorderedWrite(ev, "user_id", "ts_us", out, nFiles = 8)
      s.read.parquet(out).orderBy(col("event_id"))
    }),

    "q_sim_lsh" -> ((s0, dir) => {
      val s = ensure(s0)
      // hyperplane LSH bucket assignment, oracle-checked end to end:
      // the oracle embeds the same 8×64 Gaussian plane literals (see
      // Sim.gaussianPlanes) and recomputes every sign. sign(dot) is
      // float-noise-safe here: |dot| ~ O(√dim), never within 1e-10 of
      // the boundary on this data.
      Sim.hyperplaneLshBuckets(Tables.embeddings(s, dir), dim = 64, nPlanes = 8)
        .select(col("vec_id"), col("bucket"))
        .orderBy(col("vec_id"))
    }),

    "q_topk_groups" -> ((s0, dir) => {
      val s = ensure(s0)
      // top-5 events by value per event type, THROUGH the bounded-state
      // TopKAggregator (ops/TopK.scala) — the custom Aggregator itself
      // passes the oracle gate; the oracle states the same result the
      // window-rank way. Ordering on the raw double; rounding is
      // output-only so tie-breaks agree bit-for-bit across engines.
      ops.TopK.topKPerGroupTyped(
          Tables.events(s, dir).select(
            col("event_type"), col("value"), col("event_id")),
          "event_type", "value", "event_id", k = 5)
        .select(col("event_type"), col("rnk"),
          round(col("value"), 4).as("value_r"), col("event_id"))
        .orderBy(col("event_type"), col("rnk"))
    }),

    "q_json_keys" -> ((s0, dir) => {
      val s = ensure(s0)
      // dirty the feed: every 5th row carries a different shape (extra
      // tag key, no k), every 11th is malformed and parses to nothing
      val raw = when(col("event_id") % 11 === 0, lit("{not json"))
        .when(col("event_id") % 5 === 0,
          concat(lit("{\"tag\": \""), col("event_type"), lit("\", \"n\": "),
            (col("event_id") % 7).cast("string"), lit("}")))
        .otherwise(col("props"))
      // scan fan-out: the per-row JSON parse is the whole cost and the
      // events parquet is one split — spread it before parsing
      EventOps.jsonKeyProfile(
          Tables.events(s, dir).select(raw.as("raw"))
            .repartition(s.sparkContext.defaultParallelism), "raw")
        .orderBy(col("key"))
    }),

    // ---- batch 12: corpus governance + release ops ----

    "q_mix_temperature" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.temperatureWeights(Tables.documents(s, dir), "source", 0.5)
        .orderBy(col("source"))
    }),

    "q_quality_norm" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.percentileNormalize(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("pr_r"), col("above_median"), col("grp_median_r"))
        .orderBy(col("doc_id"))
    }),

    "q_k_anonymity" -> ((s0, dir) => {
      val s = ensure(s0)
      val ev = Tables.events(s, dir).withColumn(
        "day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      Relational.kAnonymize(ev, Seq("event_type", "day"), "user_id", "value", 55)
        .orderBy(col("event_type"), col("day"))
    }),

    "q_oov_rate" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.oovRate(Tables.documents(s, dir), 100L)
        .orderBy(col("doc_id"))
    }),

    "q_dedup_incremental" -> ((s0, dir) => {
      val s = ensure(s0)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      // incoming batch: exact copies of every 3rd corpus doc (re-id'd),
      // fresh suffix-modified docs, and an in-batch duplicate of each
      // fresh doc (id+300000) — so all three verdict columns light up
      val copies = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val fresh = docs.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" zz8 zz8")).as("text"))
      val rebatch = fresh.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val batch = copies.unionByName(fresh).unionByName(rebatch)
        .repartition(s.sparkContext.defaultParallelism)
      Dedup.incrementalNewDocs(docs, batch).orderBy(col("doc_id"))
    }),

    "q_overlap_matrix" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.sourceOverlapMatrix(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism))
        .orderBy(col("src_a"), col("src_b"))
    }),

    "q_embed_proto" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.prototypicality(Tables.embeddings(s, dir))
        .orderBy(col("vec_id"))
    }),

    // ---- batch 13: graph + embedding-training ops ----

    "q_textrank" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.textrank(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          0.85, 5)
        .orderBy(col("token"))
    }),

    "q_hard_negatives" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.hardNegatives(Tables.embeddings(s, dir), 10, 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_knn_vote" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.knnLabelVote(Tables.embeddings(s, dir), 10, 5)
        .orderBy(col("vec_id"))
    }),

    // ---- batch 14: fingerprints + temporal + batching audits ----

    "q_winnow" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.winnow(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism),
          3, 4)
        .orderBy(col("doc_id"), col("fp_pos"))
    }),

    "q_pit_join" -> ((s0, dir) => {
      val s = ensure(s0)
      // point-in-time: each purchase looks up the SCD2 attribute
      // version valid at its timestamp — historical-report semantics
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val dim = Mutations.scd2(ev, "user_id", "event_type", "ts_us", "event_id")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      Mutations.pointInTimeJoin(facts, dim, "user_id", "ts_us", "event_type")
        .orderBy(col("event_id"))
    }),

    "q_length_buckets" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.lengthBuckets(Tables.documents(s, dir), 8)
        .orderBy(col("bucket"))
    }),

    "q_interleave" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.interleaveOrder(Tables.documents(s, dir), "source", 100)
    }),

    "q_split_leakage" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.splitLeakage(exactDupCorpus(s, dir),
          Seq(("train", 0.9), ("val", 0.95), ("test", 1.0)))
        .orderBy(col("a"), col("b"))
    }),

    // ---- batch 15: text-to-vector + sampling ----

    "q_hash_embed" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.hashedBowVectors(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism), 64)
        .orderBy(col("doc_id"), col("bucket"))
    }),

    "q_skipgrams" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.skipgramPairs(
          Tables.documents(s, dir)
            .repartition(s.sparkContext.defaultParallelism), 2)
        .orderBy(col("center"), col("context"))
    }),

    "q_reservoir" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.reservoirSample(
          Tables.documents(s, dir).select(col("doc_id"), col("source")), 100)
        .orderBy(col("doc_id"))
    }),

    // ---- batch 16: corpus-health diagnostics ----

    "q_kl_sources" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.sourceKlDivergence(Tables.documents(s, dir))
        .orderBy(col("source"))
    }),

    "q_zipf" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.zipfFit(Tables.documents(s, dir))
    }),

    "q_burstiness" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tokenBurstiness(Tables.documents(s, dir))
        .orderBy(col("token"))
    }),

    // ---- batch 17: crawl hygiene + pipeline health ----

    "q_dedup_url" -> ((s0, dir) => {
      val s = ensure(s0)
      // three URL variants per page — tracking query, cased host +
      // trailing slash, bare — that canonicalization must collapse
      val page = expr("doc_id div 3")
      val src = concat(lit("src"), pmod(page, lit(20L)).cast("string"))
      val raw = when(col("doc_id") % 3 === 0,
          concat(lit("https://"), src, lit(".example.com/page/"),
            page.cast("string"), lit("?utm_source=feed")))
        .when(col("doc_id") % 3 === 1,
          concat(lit("https://"), upper(src), lit(".EXAMPLE.com/page/"),
            page.cast("string"), lit("/")))
        .otherwise(
          concat(lit("https://"), src, lit(".example.com/page/"),
            page.cast("string")))
      Text.canonicalUrlDedup(
          Tables.documents(s, dir).select(col("doc_id"), raw.as("url")))
        .orderBy(col("doc_id"))
    }),

    "q_anomaly_days" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.dailyVolumeAnomalies(Tables.events(s, dir), "ts_us", 3.0)
        .orderBy(col("day"))
    }),

    "q_ppl_buckets" -> ((s0, dir) => {
      val s = ensure(s0)
      Corpus.perplexityBuckets(Tables.documents(s, dir))
        .orderBy(col("doc_id"))
    }),

    "q_cdc_apply" -> ((s0, dir) => {
      val s = ensure(s0)
      // binlog replay: base = pre-T1 per-user state; two cumulative
      // update batches (seq 1, 2) + a delete batch (seq 3, every 7th
      // user) — last writer wins, the delete outranks everything
      val e = Tables.events(s, dir).filter(col("user_id").isNotNull)
      def agg(upTo: Long) = e.filter(col("ts_us") < upTo)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_v_r"))
      val base = agg(Tables.D2024_01_10_US)
      val c1 = agg(Tables.D2024_01_15_US)
        .join(e.filter(col("ts_us") >= Tables.D2024_01_10_US &&
          col("ts_us") < Tables.D2024_01_15_US).select(col("user_id")).distinct(),
          Seq("user_id"), "left_semi")
        .select(col("user_id"), lit("U").as("op"), lit(1L).as("seq"),
          col("n_events"), col("sum_v_r"))
      val c2 = agg(Long.MaxValue)
        .join(e.filter(col("ts_us") >= Tables.D2024_01_15_US)
          .select(col("user_id")).distinct(), Seq("user_id"), "left_semi")
        .select(col("user_id"), lit("U").as("op"), lit(2L).as("seq"),
          col("n_events"), col("sum_v_r"))
      val c3 = e.select(col("user_id")).distinct()
        .filter(col("user_id") % 7 === 0)
        .select(col("user_id"), lit("D").as("op"), lit(3L).as("seq"),
          lit(null).cast("long").as("n_events"),
          lit(null).cast("double").as("sum_v_r"))
      Mutations.applyChangelog(base, c1.unionByName(c2).unionByName(c3),
          "user_id", "seq")
        .orderBy(col("user_id"))
    }),

    // ---- batch 18 (round 7): in-doc gates + smoothing + cluster audit ----

    "q_repetition" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.repetitionSignals(
          Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism))
        .orderBy(col("doc_id"))
    }),

    "q_lm_interp" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.interpolatedLogProb(
          Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism),
          0.7)
        .orderBy(col("doc_id"))
    }),

    "q_cluster_purity" -> ((s0, dir) => {
      val s = ensure(s0)
      // same trained quantizer configuration as q_sim_ann_kmeans /
      // q_dedup_semantic, so the dynamic oracle shares one model build
      Sim.clusterPurity(Tables.embeddings(s, dir),
          nCells = 8, iters = 4, sampleMod = 2)
        .orderBy(col("cell"))
    }),

    "q_media_decode" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // REAL binary round-trip: deterministic solid-color PPMs are
      // ENCODED from doc_id, every 10th payload truncated (corrupt),
      // then the actual PpmCodec decode → resize(2x2) → channel-stat
      // path runs; the oracle derives the same stats arithmetically
      // from doc_id, so a header-parse, quarantine, resample, or
      // statistics bug all hash-mismatch.
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
          val rgb = new Array[Byte](w * h * 3)
          var p = 0
          while (p < w * h) {
            rgb(p * 3) = (id % 256).toByte
            rgb(p * 3 + 1) = ((id * 7) % 256).toByte
            rgb(p * 3 + 2) = ((id * 13) % 256).toByte
            p += 1
          }
          val bytes0 = Multimodal.PpmCodec.encode(Multimodal.PpmCodec.Image(w, h, rgb))
          val bytes = if (id % 10 == 0) bytes0.take(8) else bytes0
          Multimodal.MediaRow(id, "image", bytes, bytes.length.toLong, "ppm")
        }
      def feat(i: Int) = when(col("n_frames") === 0, lit(null).cast("double"))
        .otherwise(element_at(col("features"), i))
      Multimodal.decodePpmFeatures(media, resizeTo = Some((2, 2))).toDF()
        .select(
          col("media_id"), col("n_frames").cast("long").as("n_frames"),
          feat(1).as("w"), feat(2).as("h"),
          feat(3).as("mean_r"), feat(4).as("mean_g"), feat(5).as("mean_b"),
          round(feat(6), 4).as("luma_mean_r"), round(feat(7), 4).as("luma_std_r"))
        .orderBy(col("media_id"))
    }),

    "q_audio_decode" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // the audio twin of q_media_decode: deterministic 8 kHz square
      // waves (period 8, amplitude from doc_id) ENCODED as real WAV
      // bytes, every 7th payload truncated, then the actual RIFF/PCM16
      // decode + signal-stat path runs. Square waves make duration,
      // RMS (= amp/2^15, exact in IEEE), and zero-crossing rate
      // arithmetically derivable, so the oracle restates them from
      // doc_id alone.
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val n = (800 + (id % 5) * 400).toInt
          val amp = (500 + (id % 100) * 100).toShort
          val samples = Array.tabulate(n)(i =>
            if ((i / 4) % 2 == 0) amp else (-amp).toShort)
          val bytes0 = Multimodal.WavCodec.encode(
            Multimodal.WavCodec.Audio(8000, 1, samples))
          val bytes = if (id % 7 == 0) bytes0.take(20) else bytes0
          Multimodal.MediaRow(id, "audio", bytes, bytes.length.toLong, "wav")
        }
      def feat(i: Int) = when(col("n_frames") === 0, lit(null).cast("double"))
        .otherwise(element_at(col("features"), i))
      Multimodal.decodeWavFeatures(media).toDF()
        .select(
          col("media_id"), col("n_frames").cast("long").as("n_frames"),
          feat(1).as("dur_sec"), feat(2).as("rms"), feat(3).as("zcr"))
        .orderBy(col("media_id"))
    }),

    "q_ngram_novelty" -> ((s0, dir) => {
      val s = ensure(s0)
      // the perturbed corpus plants known non-novel docs: each
      // doc_id+100000 copy shares every original shingle, so its
      // novelty collapses while the original keeps scoring high
      Dedup.ngramNovelty(perturbedCorpus(s, dir))
        .orderBy(col("doc_id"))
    }),

    "q_recency_score" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.recencyScore(Tables.events(s, dir),
          Tables.D2024_01_20_US, halflifeDays = 2.0)
        .orderBy(col("user_id"))
    }),

    "q_dup_cluster_stats" -> ((s0, dir) => {
      val s = ensure(s0)
      // the post-dedup audit composed over the SAME keeper run as
      // q_dedup_cc (chain corpus -> CC keepers -> size histogram)
      Dedup.clusterSizeHistogram(
          Dedup.connectedComponentKeepers(chainCorpus(s, dir, cap = 500), minJaccard = 0.7))
        .orderBy(col("cluster_size"))
    }),

    // ---- batch 19: sub-doc dedup, sparse retrieval, KN smoothing,
    //      l-diversity, SQ ANN, perceptual image hash ----

    "q_dedup_lines" -> ((s0, dir) => {
      val s = ensure(s0)
      // the perturbed corpus plants sub-document duplication: each
      // +100000 copy repeats every full 8-token segment of its
      // original, so copies score high dup_frac while originals keep
      // first-occurrence credit
      Dedup.segmentDedup(perturbedCorpus(s, dir), w = 8)
        .orderBy(col("doc_id"))
    }),

    "q_sparse_cosine" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.tfidfCosineTopK(Tables.documents(s, dir),
          nQueries = 20, k = 5, dfCapFrac = 0.85)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_kn_bigram" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.knBigramLogProb(
          Tables.documents(s, dir).repartition(s.sparkContext.defaultParallelism),
          discount = 0.75)
        .orderBy(col("doc_id"))
    }),

    "q_l_diversity" -> ((s0, dir) => {
      val s = ensure(s0)
      // QI = (event_type, day); subject = user_id; sensitive = the
      // coarse value band floor(value/100). The value distribution is
      // right-skewed (bands 2-4 per group), so k = 50 and l = 3 each
      // suppress a REAL subset of groups — both gates are exercised
      val ev = Tables.events(s, dir)
        .withColumn("day", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
        .withColumn("v_band", floor(col("value") / 100).cast("long"))
      Relational.lDiversity(ev, Seq("event_type", "day"), "user_id", "v_band",
          "value", k = 50, l = 3)
        .orderBy(col("event_type"), col("day"))
    }),

    "q_sim_sq" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.cosineTopKSq(Tables.embeddings(s, dir),
          nQueries = 10, k = 5, shortlist = 20)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_media_phash" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // REAL perceptual-hash round trip: 16x16 two-tone rasters whose
      // 2x2 blocks follow a bijective bit pattern seeded by doc_id % 5
      // are ENCODED as PPM bytes, every 9th truncated; the actual
      // decode -> resize(8x8) -> luma -> mean-threshold path then runs,
      // and exact-hash grouping assigns keepers. The oracle derives the
      // same 64-bit pattern arithmetically from doc_id, so a decode,
      // resize-sampling, luma, threshold, or grouping bug all mismatch.
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val seed = (id % 5).toInt * 13
          val rgb = new Array[Byte](16 * 16 * 3)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val i8 = (y / 2) * 8 + (x / 2)
              val v: Byte = if ((i8 * 31 + seed) % 64 < 32) 255.toByte else 0.toByte
              val p = (y * 16 + x) * 3
              rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
              x += 1
            }
            y += 1
          }
          val bytes0 = Multimodal.PpmCodec.encode(Multimodal.PpmCodec.Image(16, 16, rgb))
          val bytes = if (id % 9 == 0) bytes0.take(6) else bytes0
          Multimodal.MediaRow(id, "image", bytes, bytes.length.toLong, "ppm")
        }
      val byHash = Window.partitionBy(col("ahash"))
      Multimodal.averageHash(media, size = 8).toDF()
        .withColumn("group_n", when(col("decoded") === 0, 0L)
          .otherwise(count(lit(1)).over(byHash).cast("long")))
        .withColumn("keep", when(col("decoded") === 0, 0L)
          .otherwise(when(col("media_id") === min(col("media_id")).over(byHash), 1L)
            .otherwise(0L)))
        .select(col("media_id"), col("decoded").cast("long").as("decoded"),
          col("ahash"), col("group_n"), col("keep"))
        .orderBy(col("media_id"))
    }),

    // ---- batch 20: BM25, hybrid fusion, late interaction, skew
    //      salting, perceptual-hash banding ----

    "q_bm25" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.bm25TopK(Tables.documents(s, dir), nQueries = 20, k = 5)
        .orderBy(col("q_id"), col("rnk"))
    }),

    "q_rrf" -> ((s0, dir) => {
      val s = ensure(s0)
      // hybrid retrieval: fuse the tf-idf cosine ranking and the BM25
      // ranking (incomparable score scales) per query via RRF
      val docs = Tables.documents(s, dir)
      Text.rrfFuse(Seq(
          Text.tfidfCosineTopK(docs, nQueries = 10, k = 20, dfCapFrac = 0.85),
          Text.bm25TopK(docs, nQueries = 10, k = 20)), c = 60.0, k = 5)
        .orderBy(col("q_id"), col("fused_rnk"))
    }),

    "q_salted_join" -> ((s0, dir) => {
      val s = ensure(s0)
      // events ⋈ per-event-type stats dim: 5 dim rows = EVERY key is
      // hot, the worst case a plain shuffle join degenerates on. The
      // salted plan fans each key 8 ways; the oracle is the UNSALTED
      // join — identical result set is the operator's contract
      val ev = Tables.events(s, dir)
      val dim = ev.groupBy(col("event_type").as("et")).agg(
        count(lit(1)).as("n_t"),
        round(sum(col("value")), 4).as("sum_v_r"))
      Relational.saltedJoin(
          ev.select(col("event_id"), col("event_type")),
          dim, probeKey = "event_type", buildKey = "et", salt = 8)
        .select(col("event_id"), col("event_type"), col("n_t"), col("sum_v_r"))
        .orderBy(col("event_id"))
    }),

    "q_maxsim" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.maxSimTopK(Tables.embeddings(s, dir),
          groupEvery = 4, nQueryDocs = 5, k = 5)
        .orderBy(col("q_doc"), col("rnk"))
    }),

    "q_media_phash_band" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // near-dup image planting: base pattern from doc_id % 64, odd
      // ids flip ONE bit at (doc_id/64) % 64 — same-base pairs sit at
      // hamming 0/1/2 and banding must find them all; every 9th
      // payload corrupt (quarantined out before banding). The pattern
      // bits come from an XOR MIX of (base, i) — NOT an additive
      // shift family: any pattern of the form f(s + step·i) makes
      // different bases collide on whole 16-bit bands (and sit at
      // small hamming), flooding the verify with cross-group
      // candidates — measured 49 s at sf0.1 before the mix; the XOR
      // decorrelates bands across bases (measured: candidates ==
      // within-group pairs)
      val media = Tables.documents(s, dir)
        .filter(col("doc_id") < 2000).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id % 64
          val flip = if (id % 2 == 1) ((id / 64) % 64).toInt else -1
          val rgb = new Array[Byte](8 * 8 * 3)
          var i = 0
          while (i < 64) {
            val bright =
              (((i * 144115188075855881L) ^ (base * 2654435761L)) % 97 < 48) !=
                (i == flip)
            val v: Byte = if (bright) 255.toByte else 0.toByte
            rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
            i += 1
          }
          val bytes0 = Multimodal.PpmCodec.encode(Multimodal.PpmCodec.Image(8, 8, rgb))
          val bytes = if (id % 9 == 0) bytes0.take(6) else bytes0
          Multimodal.MediaRow(id, "image", bytes, bytes.length.toLong, "ppm")
        }
      Multimodal.phashNearDupPairs(
          Multimodal.averageHash(media, size = 8).toDF(),
          hashBits = 64, bands = 4, maxHamming = 2)
        .orderBy(col("a"), col("b"))
    }),

    // ---- batch 21: actionable trim + sketch audit ----

    "q_dedup_lines_trim" -> ((s0, dir) => {
      val s = ensure(s0)
      // the rewrite form of q_dedup_lines: copies lose every segment
      // they repeat (most come back near-empty), originals keep their
      // text verbatim minus natural collisions
      Dedup.segmentTrim(perturbedCorpus(s, dir), w = 8)
        .orderBy(col("doc_id"))
    }),

    "q_minhash_error" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.minhashEstimatorAudit(perturbedCorpus(s, dir, cap = 2000))
        .orderBy(col("n_pairs"))
    }),

    "q_video_decode" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // REAL multi-frame round trip: 3-6 solid-gray 4x4 frames per
      // video, luma alternating base / base+delta frame to frame, are
      // ENCODED as a concatenated-P6 stream (ffmpeg's image2pipe ppm
      // form); every 8th payload loses its final frame mid-raster.
      // The actual stream-walking decode + frame-order luma fold +
      // shot-boundary count then runs; the oracle derives frame count,
      // truncation, mean luma, and scene changes (delta > 64 ⟺ every
      // consecutive pair cuts) arithmetically from doc_id.
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val nf = (3 + id % 4).toInt
          val base = (id % 120).toInt
          val delta = (30 + (id % 10) * 10).toInt
          val frames = (0 until nf).map { f =>
            val v = (base + (f % 2) * delta).toByte
            Multimodal.PpmCodec.Image(4, 4, Array.fill(4 * 4 * 3)(v))
          }
          val bytes0 = Multimodal.PpmVideoCodec.encode(frames)
          val bytes = if (id % 8 == 0) bytes0.dropRight(10) else bytes0
          Multimodal.MediaRow(id, "video", bytes, bytes.length.toLong, "ppms")
        }
      def feat(i: Int) = element_at(col("features"), i)
      Multimodal.decodeVideoFeatures(media, sceneThreshold = 64.0).toDF()
        .select(
          col("media_id"), col("n_frames").cast("long").as("n_frames"),
          feat(1).cast("long").as("truncated"),
          round(feat(2), 4).as("mean_luma_r"),
          feat(3).cast("long").as("n_scenes"))
        .orderBy(col("media_id"))
    }),

    "q_audio_vad" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // REAL VAD round trip: 4-8 alternating speech/silence blocks of
      // 400 samples (speech first) encoded as WAV, every 6th payload
      // truncated; energy VAD with block-aligned 400-sample windows
      // makes speech windows, isolated segments, and speech seconds
      // (0.05 s per window at 8 kHz) arithmetically derivable
      val media = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val nb = (4 + id % 5).toInt
          val amp = (500 + (id % 40) * 50).toShort
          val samples = Array.tabulate(nb * 400) { i =>
            val block = i / 400
            if (block % 2 == 0) { if (i % 8 < 4) amp else (-amp).toShort }
            else 0.toShort
          }
          val bytes0 = Multimodal.WavCodec.encode(
            Multimodal.WavCodec.Audio(8000, 1, samples))
          val bytes = if (id % 6 == 0) bytes0.take(24) else bytes0
          Multimodal.MediaRow(id, "audio", bytes, bytes.length.toLong, "wav")
        }
      Multimodal.vadSegments(media, windowSamples = 400, rmsThreshold = 0.001)
        .toDF()
        .select(col("media_id"), col("decoded").cast("long").as("decoded"),
          col("n_windows"), col("n_speech"), col("n_segments"),
          when(col("decoded") === 0, lit(null).cast("double"))
            .otherwise(round(col("speech_sec"), 4)).as("speech_sec_r"))
        .orderBy(col("media_id"))
    }),

    "q_media_dedup_cc" -> ((s0, dir) => {
      val s = ensure(s0)
      import s.implicits._
      // the capstone composition: IMAGE near-dup pairs (real decode →
      // aHash → hamming banding) feed the SAME transitive CC keeper
      // machinery the text path uses — dedup is modality-agnostic once
      // candidates exist. Same planted rasters as q_media_phash_band:
      // every same-base pair sits within hamming 2, so components are
      // exactly the base groups and the oracle derives keepers
      // arithmetically
      val media = Tables.documents(s, dir)
        .filter(col("doc_id") < 2000).select(col("doc_id")).as[Long]
        .map { id =>
          val base = id % 64
          val flip = if (id % 2 == 1) ((id / 64) % 64).toInt else -1
          val rgb = new Array[Byte](8 * 8 * 3)
          var i = 0
          while (i < 64) {
            val bright =
              (((i * 144115188075855881L) ^ (base * 2654435761L)) % 97 < 48) !=
                (i == flip)
            val v: Byte = if (bright) 255.toByte else 0.toByte
            rgb(i * 3) = v; rgb(i * 3 + 1) = v; rgb(i * 3 + 2) = v
            i += 1
          }
          val bytes0 = Multimodal.PpmCodec.encode(Multimodal.PpmCodec.Image(8, 8, rgb))
          val bytes = if (id % 9 == 0) bytes0.take(6) else bytes0
          Multimodal.MediaRow(id, "image", bytes, bytes.length.toLong, "ppm")
        }
      val hashes = Multimodal.averageHash(media, size = 8).toDF()
      val pairs = Multimodal.phashNearDupPairs(hashes,
          hashBits = 64, bands = 4, maxHamming = 2)
        .select(col("a"), col("b"))
      val vertices = hashes.filter(col("decoded") === 1)
        .select(col("media_id").as("doc_id"))
      Dedup.ccKeepersFromEdges(pairs, vertices)
        .select(col("doc_id").as("media_id"), col("keep_id"))
        .orderBy(col("media_id"))
    }),

    "q_rfm" -> ((s0, dir) => {
      val s = ensure(s0)
      EventOps.rfmSegments(Tables.events(s, dir), Tables.D2024_01_20_US)
        .orderBy(col("user_id"))
    })
  )

  /** documents ∪ suffix-perturbed copies (high-Jaccard near-dups).
    * Repartitioned: the small parquet arrives as 1-2 splits, which
    * would serialize the hash-heavy map-side work onto 2 cores.
    */
  private def perturbedCorpus(s: SparkSession, dir: String, cap: Long = Long.MaxValue): DataFrame = {
    val d = Tables.documents(s, dir)
      .filter(col("doc_id") < cap)
      .select(col("doc_id"), col("text"))
    d.unionByName(d.select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" zz9 zz9")).as("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** documents ∪ exact copies (identical token bags). */
  private def exactDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** documents ∪ two prefix-truncated generations — guaranteed
    * duplicate CHAINS. Prefix truncation keeps shingle sets nested, so
    * Jaccards are pure length ratios: B (80% prefix) ~ A at J≈0.8 and
    * C (64% prefix) ~ B at J≈0.8, but C ~ A only at J≈0.64 < 0.7 —
    * A-B-C connect transitively, never directly. Exactly the input a
    * one-hop keeper gets wrong and connected components gets right.
    */
  private def chainFrame(s: SparkSession, dir: String, cap: Long): DataFrame = {
    val d = Tables.documents(s, dir)
      .filter(col("doc_id") < cap)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"), col("text"))
    def prefix(frac: Double): Column =
      array_join(slice(col("toks"), lit(1), ceil(size(col("toks")) * frac).cast("int")), " ")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.select((col("doc_id") + 100000L).as("doc_id"), prefix(0.80).as("text")))
      .unionByName(d.select((col("doc_id") + 200000L).as("doc_id"), prefix(0.64).as("text")))
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** The chain corpus is a deterministic derived FIXTURE (like the
    * date-partitioned layout and the GA4 parquet): materialized
    * write-once, then read from parquet — the per-doc tokenize+slice
    * construction is an input, not part of the operator under test.
    * Cached because the CC pipeline consumes it twice (shingles +
    * final keeper join).
    */
  /** ProfCc's phase-profiling entry into the q_dedup_cc corpus. */
  private[graft] def chainCorpusForProf(s: SparkSession, dir: String): DataFrame =
    chainCorpus(s, dir, cap = 500)

  private def chainCorpus(s: SparkSession, dir: String, cap: Long): DataFrame = {
    val path = tmpDir(s"chain_$cap", dir)
    Sinks.ensureWritten(chainFrame(s, dir, cap), path)
    // Plain read, no repartition, no cache: the fixture is pre-written
    // by prepare(), its consumers are two cheap scans (shingle pipeline
    // + final keeper join), and on this corpus size the repartition
    // exchange + cache-materialize action cost more in job launches
    // than the md5 pipeline they parallelize. (The old ~2.5 s
    // single-core profile predates prepare() — it was timing the
    // tokenize+slice CONSTRUCTION, which is now write-once.)
    s.read.parquet(path)
  }

  /** The GA4-shaped nested table (the reference's actual N1 input,
    * `/root/reference/extract_bq.py:155-164`): `event_params` is
    * ARRAY<STRUCT<key, value STRUCT<string_value, int_value>>>,
    * derived deterministically from `events` so the DuckDB oracle can
    * state the expected extraction from first principles. The five
    * shapes by event_id % 5: NULL array (0), key among others (1),
    * DUPLICATE key — last must win (2), key absent (3), key first (4).
    */
  private def ga4Frame(events: DataFrame): DataFrame = {
    val kStr = get_json_object(col("props"), "$.k")
    val kLong = kStr.cast("long")
    def p(key: String, sv: Column, iv: Column): Column = struct(
      lit(key).as("key"),
      struct(sv.as("string_value"), iv.as("int_value")).as("value"))
    def pStr(key: String, sv: Column): Column = p(key, sv, lit(null).cast("long"))
    val m = col("event_id") % 5
    val params =
      when(m === 0, lit(null))
        .when(m === 1, array(pStr("page", lit("home")), p("k", kStr, kLong)))
        .when(m === 2, array(
          p("k", kStr, kLong),
          p("k", (kLong * 2).cast("string"), kLong * 2)))
        .when(m === 3, array(pStr("page", lit("search"))))
        .otherwise(array(p("k", kStr, kLong), pStr("page", lit("cart"))))
    events.select(
      col("event_id"),
      col("user_id").cast("string").as("user_id"),
      col("ts_us").as("event_timestamp"),
      col("event_type").as("event_name"),
      params.as("event_params"))
  }

  private def ga4Table(s: SparkSession, dir: String): DataFrame = {
    val ga4 = tmpDir("ga4", dir)
    Sinks.ensureWritten(ga4Frame(Tables.events(s, dir)), ga4)
    s.read.parquet(ga4)
  }

  /** One-time scratch materializations (the date-partitioned events
    * layout, the GA4 nested parquet). Queries run the same ensure*
    * calls lazily; Bench calls this BEFORE the timed region so layout
    * construction — an input, like the testdata itself — isn't billed
    * to whichever query happens to touch it first.
    */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    val s = ensure(spark)
    Sinks.ensurePartitioned(
      Tables.events(s, sfDir).withColumn(
        "event_date", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd")),
      tmpDir("events_by_date", sfDir), "event_date")
    Sinks.ensureWritten(ga4Frame(Tables.events(s, sfDir)), tmpDir("ga4", sfDir))
    Sinks.ensureWritten(chainFrame(s, sfDir, 500), tmpDir("chain_500", sfDir))
    Sinks.ensureTextWritten(
      Tables.events(s, sfDir).select(
        when(col("event_id") % 13 === 0, lit("{broken json line"))
          .otherwise(to_json(struct(
            col("event_id"), col("event_type"),
            col("user_id"), col("ts_us")))).as("value"))
        .repartition(s.sparkContext.defaultParallelism),
      tmpDir("dirty_jsonl", sfDir))
  }

  // ---------------------------------------------------------------------------
  // DuckDB oracle SQL — same tables, same column names, same row order.
  // ---------------------------------------------------------------------------

  /** The CC keeper oracle's CTE chain (corpus construction → shingle
    * hashes → verified edges → transitive reach), shared verbatim by
    * `q_dedup_cc` and the cluster-size histogram that composes on it.
    */
  private val ccKeeperCtes: String =
    """        |base AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents WHERE doc_id < 500),
        |corpus AS (
        |  SELECT doc_id, array_to_string(toks, ' ') AS text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.80 AS DOUBLE)) AS INT)], ' ')
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.64 AS DOUBLE)) AS INT)], ' ')
        |  FROM base),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4),
        |cands AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT c.a, c.b, count(*) AS cnt FROM cands c
        |  JOIN hx xa ON xa.doc_id = c.a
        |  JOIN hx xb ON xb.doc_id = c.b AND xb.h = xa.h
        |  GROUP BY c.a, c.b),
        |verified AS (
        |  SELECT m.a, m.b FROM common m
        |  JOIN sizes sa ON sa.doc_id = m.a
        |  JOIN sizes sb ON sb.doc_id = m.b
        |  WHERE round(m.cnt / (sa.sz + sb.sz - m.cnt), 4) >= 0.7),
        |edges AS (
        |  SELECT a, b FROM verified UNION ALL SELECT b, a FROM verified),
        |reach AS (
        |  SELECT a AS doc_id, b AS r FROM edges
        |  UNION
        |  SELECT rc.doc_id, e.b FROM reach rc JOIN edges e ON e.a = rc.r)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_scan_events" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        |       round(value, 4) AS value_r, props
        |FROM events ORDER BY event_id""".stripMargin,

    "q_prune_dates" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, strftime(ts, '%Y-%m-%d') AS event_date
        |FROM events
        |WHERE epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1705708800000000
        |ORDER BY event_id""".stripMargin,

    "q_project" ->
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, props,
        |       strftime(ts, '%Y-%m-%d') AS event_date
        |FROM events ORDER BY event_id""".stripMargin,

    "q_filter_nonnull" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND event_type <> ''
        |ORDER BY event_id""".stripMargin,

    "q_filter_in" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |ORDER BY event_id""".stripMargin,

    "q_filter_gt_watermark" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |WHERE epoch_us(ts) > 1705276800000000
        |ORDER BY event_id""".stripMargin,

    "q_params_extract" ->
      """SELECT event_id, user_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS param_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sort_desc" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |ORDER BY ts_us DESC, event_id DESC""".stripMargin,

    "q_sort_asc" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |ORDER BY ts_us ASC, event_id ASC""".stripMargin,

    "q_topk" ->
      """SELECT event_id, round(value, 4) AS value_r FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,

    "q_agg_max" ->
      "SELECT max(epoch_us(ts)) AS max_ts_us FROM events",

    "q_agg_count" ->
      "SELECT count(*) AS n_rows FROM events",

    "q_agg_group" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
        |       round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_dedup_key" ->
      """SELECT user_id, event_type, event_id, ts_us FROM (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_upsert_anti" ->
      """WITH existing AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
        |  WHERE event_id % 3 = 0),
        |incoming AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
        |  WHERE epoch_us(ts) > 1705276800000000)
        |SELECT i.event_id, i.user_id, i.ts_us, i.event_type FROM incoming i
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM existing e
        |  WHERE e.user_id = i.user_id AND e.ts_us = i.ts_us
        |    AND e.event_type = i.event_type)
        |ORDER BY i.event_id""".stripMargin,

    "q_union" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events)
        |SELECT * FROM (
        |  SELECT * FROM ev WHERE ts_us < 1704844800000000
        |  UNION ALL
        |  SELECT * FROM ev WHERE ts_us >= 1704844800000000 AND ts_us < 1705708800000000
        |) ORDER BY event_id""".stripMargin,

    "q_incremental" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |batch1 AS (SELECT * FROM ev WHERE ts_us <= 1705276800000000),
        |wm AS (SELECT max(ts_us) AS m FROM batch1),
        |batch2 AS (SELECT * FROM ev WHERE ts_us > (SELECT m FROM wm))
        |SELECT * FROM (
        |  SELECT * FROM batch1 UNION ALL SELECT * FROM batch2
        |) ORDER BY event_id""".stripMargin,

    "q_sink_csv" ->
      """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d') AS event_date,
        |       epoch_us(ts) AS ts_us, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS param_k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_append" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, c_name, round(o_totalprice, 4) AS total_r
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_left" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_name
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      """SELECT user_id, event_id,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS BIGINT) AS rn
        |FROM events ORDER BY user_id NULLS FIRST, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |FROM events ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type NULLS FIRST""".stripMargin,

    "q_date_parse" ->
      """WITH raw AS (
        |  SELECT event_id,
        |         CASE CAST(event_id % 4 AS INTEGER)
        |           WHEN 0 THEN strftime(ts, '%Y-%m-%d')
        |           WHEN 1 THEN strftime(ts, '%Y/%m/%d')
        |           WHEN 2 THEN strftime(ts, '%d-%m-%Y')
        |           ELSE strftime(ts, '%d/%m/%Y') END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |       strftime(coalesce(
        |         try_strptime(raw, '%Y-%m-%d'), try_strptime(raw, '%Y/%m/%d'),
        |         try_strptime(raw, '%d-%m-%Y'), try_strptime(raw, '%d/%m/%Y')),
        |         '%Y-%m-%d') AS parsed
        |FROM raw ORDER BY event_id""".stripMargin,

    "q_date_format" ->
      """SELECT event_id, strftime(ts, '%Y%m%d') AS ymd,
        |       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_arith" ->
      """SELECT event_id,
        |       strftime(ts - INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS minus_7d,
        |       strftime(ts + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_36h,
        |       CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
        |         AS days_since
        |FROM events ORDER BY event_id""".stripMargin,

    "q_epoch_micros" ->
      """SELECT event_id, epoch_us(ts) AS ts_us,
        |       strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S') AS ts_str,
        |       epoch_us(make_timestamp(epoch_us(ts))) AS roundtrip_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_string_fns" ->
      """SELECT doc_id, upper(lang) AS lang_u, concat_ws('-', lang, source) AS tag,
        |       CAST(length(text) AS BIGINT) AS n_len,
        |       substr(text, 1, 20) AS prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT token, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY freq DESC, token""".stripMargin,

    "q_heavy_hitters" ->
      """WITH f AS (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |  WHERE token <> '' GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM f)
        |SELECT f.token, f.freq,
        |       round(f.freq / CAST(tot.total AS DOUBLE), 4) AS share
        |FROM f, tot
        |WHERE f.freq >= 0.02 * tot.total
        |ORDER BY f.token""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_sim_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos_r
        |  FROM n q, n c
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM pairs)
        |SELECT q_id, c_id, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_dedup_ngram" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents
        |  WHERE doc_id < 2000),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM hx x JOIN hx y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT c.a, c.b, round(c.c / (sa.sz + sb.sz - c.c), 4) AS jaccard
        |FROM common c
        |JOIN sizes sa ON sa.doc_id = c.a
        |JOIN sizes sb ON sb.doc_id = c.b
        |WHERE round(c.c / (sa.sz + sb.sz - c.c), 4) >= 0.7
        |ORDER BY c.a, c.b""".stripMargin,

    "q_dedup_minhash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4)
        |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |FROM bands x JOIN bands y
        |  ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id
        |ORDER BY a, b""".stripMargin,

    "q_dedup_minhash_est" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents
        |  WHERE doc_id < 2000),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4),
        |cands AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id)
        |SELECT c.a, c.b,
        |       round(CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16, 4)
        |         AS j_est
        |FROM cands c
        |JOIN mh ma ON ma.doc_id = c.a
        |JOIN mh mb ON mb.doc_id = c.b AND mb.seed = ma.seed
        |GROUP BY c.a, c.b
        |ORDER BY c.a, c.b""".stripMargin,

    "q_dedup_pipeline" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents
        |  WHERE doc_id < 2000),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4),
        |cands AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT c.a, c.b, count(*) AS cnt FROM cands c
        |  JOIN hx xa ON xa.doc_id = c.a
        |  JOIN hx xb ON xb.doc_id = c.b AND xb.h = xa.h
        |  GROUP BY c.a, c.b),
        |verified AS (
        |  SELECT m.a, m.b FROM common m
        |  JOIN sizes sa ON sa.doc_id = m.a
        |  JOIN sizes sb ON sb.doc_id = m.b
        |  WHERE round(m.cnt / (sa.sz + sb.sz - m.cnt), 4) >= 0.7),
        |neighbors AS (
        |  SELECT a AS doc_id, b AS nb FROM verified
        |  UNION ALL SELECT b, a FROM verified)
        |SELECT c.doc_id, least(c.doc_id, coalesce(min(n.nb), c.doc_id)) AS keep_id
        |FROM (SELECT doc_id FROM corpus) c
        |LEFT JOIN neighbors n ON n.doc_id = c.doc_id
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,

    "q_dedup_simhash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_filter(string_split(text, ' '), t -> t != ''))) AS token
        |  FROM corpus),
        |h AS (
        |  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tok),
        |bits AS (
        |  SELECT doc_id, bs.b, sum(2 * ((h >> bs.b) & 1) - 1) AS s
        |  FROM h, (SELECT unnest(generate_series(0, 31)) AS b) bs
        |  GROUP BY doc_id, bs.b),
        |fps AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS fp
        |  FROM bits GROUP BY doc_id)
        |SELECT f.doc_id, f.fp, m.keep_id
        |FROM fps f
        |JOIN (SELECT fp, min(doc_id) AS keep_id FROM fps GROUP BY fp) m
        |  ON f.fp = m.fp
        |ORDER BY f.doc_id""".stripMargin,

    "q_dedup_embed" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE vec_id < 500),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT x.vec_id AS a, y.vec_id AS b,
        |       round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 4) AS cos_r
        |FROM n x JOIN n y ON x.vec_id < y.vec_id
        |ORDER BY cos_r DESC, a, b LIMIT 50""".stripMargin,

    "q_sim_ann" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |           row_number() OVER (
        |             PARTITION BY n.vec_id
        |             ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) DESC,
        |                      c.cent_id) AS rn
        |    FROM n, cent c) t WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell FROM assign
        |      WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.q_id, a.vec_id AS c_id,
        |         round(list_dot_product(q.qv, a.v) / (q.qn * a.nrm), 4) AS cos_r
        |  FROM assign a JOIN q ON a.cell = q.cell AND a.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT q_id, c_id, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(string_split(text, ' '), x -> x != '')) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(list_intersect(toks, ['the','a','order','key']))) AS BIGINT)
        |      AS score_p_article,
        |    CAST(len(list_distinct(list_intersect(toks, ['spark','query','table','row']))) AS BIGINT)
        |      AS score_p_query,
        |    CAST(len(list_distinct(list_intersect(toks, ['batch','stream','window','merge']))) AS BIGINT)
        |      AS score_p_stream
        |  FROM t)
        |SELECT doc_id, score_p_article, score_p_query, score_p_stream,
        |  CASE WHEN score_p_stream >= score_p_query AND score_p_stream >= score_p_article
        |         THEN 'p_stream'
        |       WHEN score_p_query >= score_p_article THEN 'p_query'
        |       ELSE 'p_article' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_lang_id_ngram" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(length(text) - 2, 1)),
        |    i -> substr(text, i, 3))) AS grams
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(list_intersect(grams, ['the','he ',' th','e t']))) AS BIGINT)
        |      AS score_c_the,
        |    CAST(len(list_distinct(list_intersect(grams, ['spa','par','ark','rk ']))) AS BIGINT)
        |      AS score_c_spk,
        |    CAST(len(list_distinct(list_intersect(grams, ['que','uer','ery','ry ']))) AS BIGINT)
        |      AS score_c_qry
        |  FROM t)
        |SELECT doc_id, score_c_the, score_c_spk, score_c_qry,
        |  CASE WHEN score_c_the >= score_c_spk AND score_c_the >= score_c_qry
        |         THEN 'c_the'
        |       WHEN score_c_spk >= score_c_qry THEN 'c_spk'
        |       ELSE 'c_qry' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_chars, len(toks) AS n_tok,
        |         len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |       round(n_chars / n_tok, 4) AS avg_tok_len,
        |       round(n_stop / n_tok, 4) AS stop_ratio,
        |       round(least(n_tok / 100.0, 1.0) * (1.0 - n_stop / n_tok), 4) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_transform(
        |    list_distinct(list_filter(string_split(text, ' '), t -> t != '')),
        |    t -> md5(t)))[1:4], '-') AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_agg_stats" ->
      """SELECT event_type,
        |       round(stddev_samp(value), 4) AS sd_value,
        |       round(var_samp(value), 4) AS var_value,
        |       round(min(value), 4) AS min_value,
        |       round(max(value), 4) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_percentile" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_above_avg" ->
      """SELECT event_id, round(value, 4) AS value_r FROM events
        |WHERE value > (SELECT avg(value) FROM events)
        |ORDER BY event_id""".stripMargin,

    "q_cube" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY CUBE(event_type, strftime(ts, '%Y-%m-%d'))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_join_full" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 700),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_custkey >= 300 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders
        |FROM a FULL OUTER JOIN b ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_window_moving" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       round(avg(value) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts), 1) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM g)
        |SELECT user_id, event_id, ts_us,
        |       CAST(sum(new_session) OVER (
        |         PARTITION BY user_id ORDER BY ts_us, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS session_idx
        |FROM f ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    "q_profile" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
        |  CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS empty_props,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT event_type) AS n_types,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        |  round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
        |FROM events""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date, count(*) AS n
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (strftime(ts, '%Y-%m-%d')))
        |ORDER BY event_type NULLS FIRST, event_date NULLS FIRST""".stripMargin,

    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         lag(epoch_us(ts), 1) OVER (
        |           PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts_us,
        |         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts >= 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts_us,
        |         sum(new_session) OVER (
        |           PARTITION BY user_id ORDER BY ts_us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f)
        |SELECT user_id,
        |       strftime(make_timestamp(min(ts_us)), '%Y-%m-%d %H:%M:%S') AS sess_start,
        |       strftime(make_timestamp(max(ts_us) + 1800000000), '%Y-%m-%d %H:%M:%S')
        |         AS sess_end,
        |       count(*) AS n
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id NULLS FIRST, sess_start""".stripMargin,

    "q_media_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  substr(hex(CAST(text AS BLOB)), 1, 16) AS head_hex,
        |  array_to_string(list_transform(generate_series(0, 2),
        |    i -> md5(substr(text, 1 + i * (length(text) // 3), (length(text) // 3)))), '-')
        |    AS frames_sig
        |FROM documents ORDER BY media_id""".stripMargin,

    // Transitive keeper: same LSH→verify pipeline as q_dedup_pipeline but
    // over the prefix-truncated CHAIN corpus, then a recursive CTE for
    // reachability — keep_id = min doc_id in the connected component.
    "q_dedup_cc" ->
      s"""WITH RECURSIVE $ccKeeperCtes
        |SELECT c.doc_id,
        |       least(c.doc_id, coalesce(min(rc.r), c.doc_id)) AS keep_id
        |FROM (SELECT doc_id FROM corpus) c
        |LEFT JOIN reach rc ON rc.doc_id = c.doc_id
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q_dup_cluster_stats" ->
      s"""WITH RECURSIVE $ccKeeperCtes,
        |keep AS (
        |  SELECT c.doc_id,
        |         least(c.doc_id, coalesce(min(rc.r), c.doc_id)) AS keep_id
        |  FROM (SELECT doc_id FROM corpus) c
        |  LEFT JOIN reach rc ON rc.doc_id = c.doc_id
        |  GROUP BY c.doc_id),
        |sz AS (SELECT keep_id, count(*) AS cluster_size FROM keep GROUP BY keep_id)
        |SELECT cluster_size,
        |       CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,


    // First-principles expectation for the GA4 nested extraction: the
    // oracle never touches event_params — it re-states, per event_id % 5
    // shape, what last-match-wins extraction over the derived
    // ARRAY<STRUCT> must return (see ga4Frame's shape table).
    "q_ga4_extract" ->
      """SELECT event_id,
        |  CASE
        |    WHEN event_id % 5 IN (1, 4) THEN json_extract_string(props, '$.k')
        |    WHEN event_id % 5 = 2
        |      THEN CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS VARCHAR)
        |    ELSE NULL END AS param_k,
        |  CASE event_id % 5
        |    WHEN 1 THEN 'home' WHEN 3 THEN 'search' WHEN 4 THEN 'cart'
        |    ELSE NULL END AS page
        |FROM events ORDER BY event_id""".stripMargin,

    // The oracle states as-of semantics the direct (quadratic) way:
    // expand all qualifying purchases per click, keep rank 1 by
    // (ts DESC, event_id DESC). The engine's union+window plan must
    // produce exactly this winner.
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |c AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, c.user_id, c.ts_us,
        |         p.ts_us AS p_ts_us, p.event_id AS p_event_id,
        |         row_number() OVER (PARTITION BY c.event_id
        |                            ORDER BY p.ts_us DESC, p.event_id DESC) AS rn
        |  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts_us <= c.ts_us)
        |SELECT event_id, user_id, ts_us, p_ts_us, p_event_id
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH win AS (
        |  SELECT CAST(i AS BIGINT) AS win_id,
        |         1704412800000000 + i * 86400000000 AS lo,
        |         1704412800000000 + i * 86400000000 + 129600000000 AS hi
        |  FROM range(20) t(i))
        |SELECT e.event_id, w.win_id, epoch_us(e.ts) AS ts_us
        |FROM events e JOIN win w
        |  ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
        |ORDER BY e.event_id, w.win_id""".stripMargin,

    "q_unpivot" ->
      """WITH m AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'discount' AS metric, round(l_discount, 4) AS val
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'extendedprice', round(l_extendedprice, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'quantity', round(l_quantity, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         'tax', round(l_tax, 4)
        |  FROM lineitem WHERE l_orderkey % 10 = 0)
        |SELECT l_orderkey, l_linenumber, l_partkey, metric, val
        |FROM m ORDER BY l_orderkey, l_linenumber, l_partkey, metric, val""".stripMargin,

    "q_user_paths" ->
      """SELECT user_id, count(*) AS n_events,
        |       string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_pii_mask" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      substr(text, 1, 120) || ' contact user' || CAST(doc_id AS VARCHAR)
        |        || '@mail.example.com or +1-555-'
        |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_gopher" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, toks, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg
        |  FROM d),
        |sig AS (
        |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |    CASE WHEN n_words > 0
        |      THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |      ELSE 0.0 END AS mean_wlen,
        |    CASE WHEN length(text) > 0
        |      THEN round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        |                 / length(text), 4)
        |      ELSE 0.0 END AS digit_frac,
        |    CASE WHEN len(bg) > 0
        |      THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |      ELSE 0.0 END AS dup_bigram_frac
        |  FROM s)
        |SELECT doc_id, n_words, mean_wlen, digit_frac, dup_bigram_frac,
        |  CAST(CASE WHEN n_words BETWEEN 10 AND 100000
        |             AND mean_wlen BETWEEN 2.0 AND 12.0
        |             AND dup_bigram_frac < 0.3
        |            THEN 1 ELSE 0 END AS BIGINT) AS gopher_ok
        |FROM sig ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 64 AS shard,
        |         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS tok_cnt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, tok_cnt,
        |         sum(tok_cnt) OVER (PARTITION BY shard ORDER BY doc_id
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT doc_id, shard, tok_cnt,
        |       CAST((cum - tok_cnt) // 2048 AS BIGINT) AS seq_id,
        |       CAST((cum - tok_cnt) % 2048 AS BIGINT) AS offset_in
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_shuffle_shard" ->
      """WITH d AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |s AS (
        |  SELECT doc_id, skey,
        |         ('0x' || substr(skey, 1, 8))::BIGINT % 8 AS shard
        |  FROM d)
        |SELECT doc_id, skey, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS rnk
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_levenshtein" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS s40 FROM documents)
        |SELECT a.doc_id AS doc_id, CAST(levenshtein(a.s40, b.s40) AS BIGINT) AS dist
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_contain" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents WHERE doc_id < 500),
        |corpus AS (
        |  SELECT doc_id, array_to_string(toks, ' ') AS text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.80 AS DOUBLE)) AS INT)], ' ')
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string(toks[1:CAST(ceil(len(toks) * CAST(0.64 AS DOUBLE)) AS INT)], ' ')
        |  FROM base),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM hx x JOIN hx y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT c.a, c.b,
        |       round(c.c / sa.sz, 4) AS cont_a,
        |       round(c.c / sb.sz, 4) AS cont_b
        |FROM common c
        |JOIN sizes sa ON sa.doc_id = c.a
        |JOIN sizes sb ON sb.doc_id = c.b
        |WHERE round(c.c / sa.sz, 4) >= 0.9 OR round(c.c / sb.sz, 4) >= 0.9
        |ORDER BY c.a, c.b""".stripMargin,

    "q_outliers" ->
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, round(e.value, 4) AS value_r,
        |       round((e.value - st.mu) / st.sd, 4) AS z_r
        |FROM events e JOIN st USING (event_type)
        |WHERE abs((e.value - st.mu) / st.sd) > 2.5
        |ORDER BY e.event_id""".stripMargin,

    "q_corr" ->
      """WITH d AS (
        |  SELECT event_type, value,
        |         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       round(corr(value, k), 4) AS corr_vk,
        |       round(covar_samp(value, k), 4) AS covar_vk
        |FROM d WHERE k IS NOT NULL
        |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |         CAST(floor((epoch_us(ts) - 1704067200000000) / 604800000000.0) AS BIGINT) AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |cohorts AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, wk FROM ev)
        |SELECT c.cohort, a.wk - c.cohort AS wk_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohorts c USING (user_id)
        |GROUP BY c.cohort, a.wk - c.cohort
        |ORDER BY cohort, wk_offset""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n,
        |       round(CAST(floor(value / 25.0) AS BIGINT) * 25.0, 4) AS lo
        |FROM events GROUP BY 1 ORDER BY bin""".stripMargin,

    "q_drift" ->
      """WITH tagged AS (
        |  SELECT event_type,
        |         CASE WHEN epoch_us(ts) < 1704844800000000 THEN 'a'
        |              WHEN epoch_us(ts) < 1705708800000000 THEN 'b' END AS side
        |  FROM events),
        |per_type AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM tagged WHERE side IS NOT NULL GROUP BY event_type),
        |tot AS (
        |  SELECT CAST(sum(n_a) AS DOUBLE) AS ta, CAST(sum(n_b) AS DOUBLE) AS tb
        |  FROM per_type)
        |SELECT event_type, n_a, n_b,
        |       round(n_a / tot.ta, 4) AS share_a,
        |       round(n_b / tot.tb, 4) AS share_b,
        |       round(abs(n_a / tot.ta - n_b / tot.tb), 4) AS drift
        |FROM per_type, tot
        |ORDER BY event_type NULLS FIRST""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |idf AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, idf.df,
        |         round(tf.tf * ln(n.n_docs / idf.df), 4) AS tfidf
        |  FROM tf JOIN idf USING (token), n),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |                    ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, tf, df, tfidf, rnk FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM tf)
        |SELECT t.doc_id,
        |       count(*) AS n_toks,
        |       round(avg(ln(tf.freq / tot.total)), 4) AS logprob
        |FROM tok t JOIN tf USING (token), tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    // The relational funnel definition: min eligible timestamp per
    // step, each step restricted to strictly-after the previous — one
    // aggregation per step (the form whose equivalence with the
    // engine's single-pass fold is the point of the check).
    "q_funnel" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |s1 AS (
        |  SELECT user_id, min(ts_us) AS t1 FROM u
        |  WHERE event_type = 'click' GROUP BY user_id),
        |s2 AS (
        |  SELECT u.user_id, min(u.ts_us) AS t2 FROM u
        |  JOIN s1 USING (user_id)
        |  WHERE u.event_type = 'view' AND u.ts_us > s1.t1 GROUP BY u.user_id),
        |s3 AS (
        |  SELECT u.user_id, min(u.ts_us) AS t3 FROM u
        |  JOIN s2 USING (user_id)
        |  WHERE u.event_type = 'purchase' AND u.ts_us > s2.t2 GROUP BY u.user_id)
        |SELECT b.user_id, s1.t1, s2.t2, s3.t3,
        |       CAST(CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages
        |FROM (SELECT DISTINCT user_id FROM u) b
        |LEFT JOIN s1 USING (user_id)
        |LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,

    // Every stage restated: dedup window, the Gopher expressions, the
    // hash-threshold draw, and the per-shard packing sums.
    "q_corpus_pipeline" ->
      """WITH dedup AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) t WHERE rn = 1),
        |tok AS (
        |  SELECT doc_id, text, lang,
        |         list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM dedup),
        |sig AS (
        |  SELECT doc_id, lang, toks, len(toks) AS n_words,
        |         CASE WHEN len(toks) >= 2 THEN
        |           list_transform(generate_series(1, len(toks) - 1),
        |             i -> toks[i] || ' ' || toks[i + 1])
        |         ELSE []::VARCHAR[] END AS bg,
        |         text
        |  FROM tok),
        |gate AS (
        |  SELECT doc_id, lang, toks FROM sig
        |  WHERE n_words BETWEEN 10 AND 100000
        |    AND (CASE WHEN n_words > 0
        |          THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / n_words, 4)
        |          ELSE 0.0 END) BETWEEN 2.0 AND 12.0
        |    AND (CASE WHEN len(bg) > 0
        |          THEN round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 4)
        |          ELSE 0.0 END) < 0.3),
        |samp AS (
        |  SELECT doc_id, lang, toks FROM gate
        |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |          / 4294967296.0
        |        < CAST(CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
        |                         WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1
        |                         ELSE 0.0 END AS DOUBLE)),
        |cnt AS (
        |  SELECT doc_id, lang, doc_id // 64 AS shard,
        |         CAST(len(toks) AS BIGINT) AS tok_cnt
        |  FROM samp),
        |cum AS (
        |  SELECT *, sum(tok_cnt) OVER (PARTITION BY shard ORDER BY doc_id
        |                               ROWS UNBOUNDED PRECEDING) AS c
        |  FROM cnt)
        |SELECT doc_id, shard, tok_cnt,
        |       CAST((c - tok_cnt) // 2048 AS BIGINT) AS seq_id,
        |       CAST((c - tok_cnt) % 2048 AS BIGINT) AS offset_in,
        |       lang
        |FROM cum ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
        |train AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM bench),
        |ttok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM train),
        |tsh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM ttok),
        |th AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM tsh),
        |btok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM bench),
        |bsh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM btok),
        |bh AS (
        |  SELECT DISTINCT ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM bsh),
        |shared AS (
        |  SELECT t.doc_id, count(*) AS n_shared
        |  FROM th t JOIN bh USING (h) GROUP BY t.doc_id)
        |SELECT tr.doc_id,
        |       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
        |       CAST(CASE WHEN coalesce(s.n_shared, 0) >= 5 THEN 1 ELSE 0 END AS BIGINT)
        |         AS contaminated
        |FROM train tr LEFT JOIN shared s USING (doc_id)
        |ORDER BY tr.doc_id""".stripMargin,

    "q_sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u,
        |         CAST(CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
        |                        WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.1
        |                        ELSE 0.0 END AS DOUBLE) AS w
        |  FROM documents)
        |SELECT doc_id, lang, round(u, 6) AS u_r
        |FROM d WHERE u < w ORDER BY doc_id""".stripMargin,

    "q_window_range" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       round(sum(value) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS hour_sum
        |FROM events
        |ORDER BY user_id NULLS FIRST, ts_us, event_id""".stripMargin,

    // arg-extrema stated via rank windows (portable form of
    // max_by/min_by with the same lexicographic tie-break)
    "q_argmax" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id DESC) AS rmax,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value ASC, event_id ASC) AS rmin
        |  FROM events)
        |SELECT event_type,
        |       max(CASE WHEN rmax = 1 THEN event_id END) AS max_event_id,
        |       min(CASE WHEN rmin = 1 THEN event_id END) AS min_event_id,
        |       round(max(value), 4) AS max_value
        |FROM r GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,

    // Like q_sink_csv, the oracle restates the EXPECTED round-trip
    // content from the source table — an independent check that the
    // JSON write+read is lossless.
    "q_sink_json" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |       round(value, 4) AS value_r
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sink_orc" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |       round(value, 4) AS value_r
        |FROM events ORDER BY event_id""".stripMargin,

    // ---- batch 7 (round 5) --------------------------------------------------
    "q_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT prev, next, count(*) AS bc FROM bi GROUP BY prev, next),
        |cc AS (SELECT prev, sum(bc) AS cc FROM bc GROUP BY prev)
        |SELECT bi.doc_id,
        |       count(*) AS n_bigrams,
        |       round(avg(ln(bc.bc / CAST(cc.cc AS DOUBLE))), 4) AS bigram_logprob
        |FROM bi JOIN bc USING (prev, next) JOIN cc USING (prev)
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin,

    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
        |  FROM documents),
        |p AS (
        |  SELECT substr(word, i, 2) AS pair
        |  FROM w, unnest(generate_series(1, length(word) - 1)) AS u(i)
        |  WHERE length(word) >= 2)
        |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

    "q_chunk_docs" ->
      """SELECT doc_id,
        |       CAST((off - 1) // 150 AS BIGINT) AS chunk_id,
        |       CAST(off AS BIGINT) AS off,
        |       CAST(length(substr(text, off, 200)) AS BIGINT) AS chunk_len,
        |       substr(substr(text, off, 200), 1, 16) AS chunk_head
        |FROM documents,
        |     unnest(generate_series(1, greatest(length(text) - 50, 1), 150)) AS u(off)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_domain_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source,
        |         round(least(len(toks) / 100.0, 1.0) *
        |               (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / len(toks)),
        |               4) AS quality
        |  FROM t),
        |r AS (
        |  SELECT doc_id, source, quality,
        |         CAST(row_number() OVER (PARTITION BY source
        |                                 ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rnk
        |  FROM q)
        |SELECT doc_id, source, quality, rnk FROM r
        |WHERE rnk <= 100 ORDER BY doc_id""".stripMargin,

    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |w AS (
        |  SELECT event_id, user_id, ts_us, event_type,
        |         max(CASE WHEN event_type = 'click' THEN ts_us END)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS last_touch_ts
        |  FROM e)
        |SELECT event_id, user_id, ts_us, last_touch_ts,
        |       ts_us - last_touch_ts AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_media_chunks" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT media_id,
        |       CAST(i AS BIGINT) AS chunk_idx,
        |       CAST(i * 100 AS BIGINT) AS offset,
        |       CAST(least(100, n_bytes - i * 100) AS BIGINT) AS chunk_bytes
        |FROM m,
        |     unnest(generate_series(0, greatest(CAST(ceil(n_bytes / 100.0) AS BIGINT) - 1, 0)))
        |       AS u(i)
        |ORDER BY media_id, chunk_idx""".stripMargin,

    "q_ntile" ->
      """WITH t AS (
        |  SELECT o_totalprice,
        |         CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS tile
        |  FROM orders)
        |SELECT tile, count(*) AS n_rows,
        |       round(min(o_totalprice), 4) AS lo,
        |       round(max(o_totalprice), 4) AS hi,
        |       round(avg(o_totalprice), 4) AS mean
        |FROM t GROUP BY tile ORDER BY tile""".stripMargin,

    "q_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CASE WHEN u < 0.9 THEN 'train'
        |            WHEN u < 0.95 THEN 'val'
        |            ELSE 'test' END AS split,
        |       round(u, 6) AS u_r
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_window_pct" ->
      """SELECT event_id, event_type,
        |       round(value, 4) AS value_r,
        |       round(percent_rank() OVER (PARTITION BY event_type
        |                                  ORDER BY value, event_id), 6) AS pct_rank,
        |       round(cume_dist() OVER (PARTITION BY event_type
        |                               ORDER BY value, event_id), 6) AS cume
        |FROM events ORDER BY event_id""".stripMargin,

    "q_stratified_n" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         CAST(row_number() OVER (PARTITION BY lang
        |                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |              AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, lang, rnk FROM r WHERE rnk <= 40 ORDER BY doc_id""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |       round(o_totalprice, 4) AS price_r
        |FROM (SELECT * FROM orders
        |      WHERE o_orderdate >= TIMESTAMP '2000-06-01') o
        |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_except" ->
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id NULLS FIRST""".stripMargin,

    "q_cross_join" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "q_window_firstlast" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  first_value(event_type) OVER w_grow AS first_type,
        |  last_value(event_type) OVER w_grow AS latest_type,
        |  nth_value(event_type, 2) OVER w_full AS second_type
        |FROM events WHERE user_id IS NOT NULL
        |WINDOW
        |  w_grow AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  w_full AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "q_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, min(d) AS lo, max(d) AS hi
        |  FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT event_type,
        |         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM span)
        |SELECT s.event_type, strftime(s.d, '%Y-%m-%d') AS day,
        |       coalesce(n, 0) AS n
        |FROM spine s LEFT JOIN daily USING (event_type, d)
        |ORDER BY event_type, day""".stripMargin,

    "q_locf" ->
      """WITH g AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v_gap
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT event_id, user_id, ts_us,
        |  round(v_gap, 4) AS v_gap_r,
        |  round(last_value(v_gap IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_fill_r
        |FROM g ORDER BY event_id""".stripMargin,

    "q_entropy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c
        |  FROM t GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy_r
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_substring" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        |  FROM t, unnest(generate_series(1, len(toks) - 7)) AS u(i)
        |  WHERE len(toks) >= 8),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        |w AS (SELECT doc_id, cnt,
        |             sum(cnt) OVER (PARTITION BY gram) AS total
        |      FROM c)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_pos,
        |       CAST(sum(CASE WHEN total >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(sum(CASE WHEN total >= 2 THEN cnt ELSE 0 END)
        |             / CAST(sum(cnt) AS DOUBLE), 4) AS dup_frac
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        |  FROM events WHERE user_id IS NOT NULL),
        |exp AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
        |                                     INTERVAL 1 DAY)) AS DATE) AS rd
        |  FROM ud),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS rd
        |  FROM b)
        |SELECT strftime(s.rd, '%Y-%m-%d') AS day,
        |       count(DISTINCT e.user_id) AS n_ids
        |FROM spine s LEFT JOIN exp e USING (rd)
        |GROUP BY s.rd ORDER BY day""".stripMargin,

    "q_regex_extract" ->
      """SELECT event_id,
        |  nullif(coalesce(regexp_extract(props, '[0-9]+'), ''), '') AS first_num,
        |  list_aggregate(regexp_extract_all(props, '[0-9]+'), 'string_agg', ',')
        |    AS all_nums,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_nums
        |FROM events ORDER BY event_id""".stripMargin,

    "q_merge_update" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (
        |  SELECT user_id, count(*) AS n_events, max(ts_us) AS last_ts_us,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |u AS (
        |  SELECT user_id, count(*) AS n_events, max(ts_us) AS last_ts_us,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us >= 1705276800000000 GROUP BY 1)
        |SELECT b.user_id,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.n_events ELSE b.n_events END AS n_events,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.last_ts_us ELSE b.last_ts_us END AS last_ts_us,
        |       CASE WHEN u.user_id IS NOT NULL THEN u.sum_v_r ELSE b.sum_v_r END AS sum_v_r,
        |       CASE WHEN u.user_id IS NOT NULL THEN 'update' ELSE 'keep' END AS merge_action
        |FROM b LEFT JOIN u ON b.user_id = u.user_id
        |UNION ALL
        |SELECT u.user_id, u.n_events, u.last_ts_us, u.sum_v_r, 'insert' AS merge_action
        |FROM u LEFT JOIN b ON u.user_id = b.user_id WHERE b.user_id IS NULL
        |ORDER BY user_id""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |t AS (
        |  SELECT *, lag(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |c AS (
        |  SELECT user_id, ts_us, event_id, event_type
        |  FROM t WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, event_type,
        |       ts_us AS valid_from, lead(ts_us) OVER w AS valid_to,
        |       (lead(ts_us) OVER w IS NULL) AS is_current
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q_window_median" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       round(value, 4) AS value_r,
        |       round(quantile_cont(value, 0.5) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med_r
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_safe_cast" ->
      """WITH d AS (
        |  SELECT event_type,
        |         CASE WHEN event_id % 7 = 0 THEN 'N/A'
        |              WHEN event_id % 11 = 0 THEN ''
        |              ELSE CAST(value AS VARCHAR) END AS raw
        |  FROM events)
        |SELECT event_type, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN try_cast(raw AS DOUBLE) IS NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |       round(avg(try_cast(raw AS DOUBLE)), 4) AS avg_ok_r
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_raw,
        |       CAST(length(norm) AS BIGINT) AS n_norm,
        |       md5(norm) AS norm_hash,
        |       substring(norm, 1, 32) AS norm_prefix
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS token
        |  FROM documents),
        |dt AS (SELECT DISTINCT doc_id, token FROM tok)
        |SELECT token, count(*) AS df,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM dt GROUP BY token HAVING count(*) >= 2
        |ORDER BY token""".stripMargin,

    "q_pmi" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c_xy FROM bi GROUP BY 1, 2),
        |l AS (SELECT w1, sum(c_xy) AS c_x FROM bc GROUP BY 1),
        |r AS (SELECT w2, sum(c_xy) AS c_y FROM bc GROUP BY 1),
        |n AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS nn FROM bc)
        |SELECT w1, w2, c_xy,
        |       round(ln(c_xy * nn / (c_x * c_y)), 4) AS pmi
        |FROM bc JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n
        |WHERE c_xy >= 5
        |ORDER BY w1, w2""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://' || source || '.example.com/docs/' ||
        |         CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |       regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |       regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS q_lang
        |FROM u ORDER BY doc_id""".stripMargin,

    // ---- batch 10 ------------------------------------------------------------
    "q_regression" ->
      """WITH e AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - 1704844800000000) / 86400000000.0 AS x,
        |         value AS y
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |       round(regr_slope(y, x), 4) AS slope_r,
        |       round(regr_intercept(y, x), 4) AS intercept_r,
        |       round(regr_r2(y, x), 4) AS r2_r
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_markov" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |p AS (
        |  SELECT event_type AS state,
        |         lead(event_type) OVER (
        |           PARTITION BY user_id ORDER BY ts_us, event_id) AS next_state
        |  FROM e),
        |c AS (
        |  SELECT state, next_state, count(*) AS n
        |  FROM p WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT state, next_state, n,
        |       round(n / sum(n) OVER (PARTITION BY state), 4) AS p_r
        |FROM c ORDER BY state, next_state""".stripMargin,

    "q_cooccur" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |s AS (SELECT event_type AS t, count(*) AS n_t FROM e GROUP BY 1),
        |tot AS (SELECT count(*) AS n_c FROM (SELECT DISTINCT user_id, day FROM e)),
        |p AS (
        |  SELECT a.event_type AS t_a, b.event_type AS t_b, count(*) AS n_ab
        |  FROM e a JOIN e b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT t_a, t_b, n_ab,
        |       round(n_ab * n_c / (sa.n_t * sb.n_t), 4) AS lift_r
        |FROM p JOIN s sa ON sa.t = p.t_a JOIN s sb ON sb.t = p.t_b
        |CROSS JOIN tot
        |ORDER BY t_a, t_b""".stripMargin,

    "q_mad_outliers" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM e JOIN m USING (event_type) GROUP BY event_type)
        |SELECT event_id, event_type, round(value, 4) AS value_r,
        |       round(CASE WHEN mad > 0
        |                  THEN (value - med) / (1.4826 * mad) END, 4) AS robust_z_r
        |FROM e JOIN m USING (event_type) JOIN d USING (event_type)
        |WHERE abs(CASE WHEN mad > 0
        |               THEN (value - med) / (1.4826 * mad) END) > 3
        |ORDER BY event_id""".stripMargin,

    "q_key_skew" ->
      """WITH k AS (
        |  SELECT user_id, count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(n) AS total_n, count(*) AS n_keys FROM k)
        |SELECT user_id, n,
        |       round(n / total_n, 6) AS share_r,
        |       round(n * n_keys / total_n, 4) AS x_avg_r
        |FROM k CROSS JOIN t
        |ORDER BY n DESC, user_id ASC LIMIT 20""".stripMargin,

    "q_reconcile" ->
      """WITH src AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS src_n,
        |         round(sum(value), 4) AS src_sum_r
        |  FROM events GROUP BY 1),
        |dst AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS dst_n,
        |         round(sum(value), 4) AS dst_sum_r
        |  FROM events WHERE event_id % 101 <> 0 GROUP BY 1)
        |SELECT day,
        |       coalesce(src_n, 0) AS src_n,
        |       coalesce(dst_n, 0) AS dst_n,
        |       coalesce(src_n, 0) - coalesce(dst_n, 0) AS missing_n,
        |       coalesce(src_sum_r, 0) AS src_sum_r,
        |       coalesce(dst_sum_r, 0) AS dst_sum_r
        |FROM src FULL OUTER JOIN dst USING (day)
        |ORDER BY day""".stripMargin,

    "q_ewma" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
        |  FROM e)
        |SELECT a.event_id, a.user_id, a.ts_us,
        |       round(a.value, 4) AS value_r,
        |       round(sum(b.value * power(0.5, a.rn - b.rn)) /
        |             sum(power(0.5, a.rn - b.rn)), 4) AS ewma_r
        |FROM r a JOIN r b
        |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
        |GROUP BY a.event_id, a.user_id, a.ts_us, a.value
        |ORDER BY a.event_id""".stripMargin,

    "q_length_band" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |         round(percent_rank() OVER (
        |           PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS len_pr
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, len_pr,
        |       (len_pr >= 0.05 AND len_pr <= 0.95) AS keep
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT event_type,
        |         quantile_cont(value, 0.05) AS lo,
        |         quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(value, 4) AS value_r,
        |       round(least(greatest(value, lo), hi), 4) AS clipped_r
        |FROM events JOIN b USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_boilerplate" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0
        |              THEN 'cookie banner terms apply here ' || text
        |              ELSE text END AS text
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM c),
        |s AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ')) AS seg
        |  FROM t, unnest(generate_series(0, CAST(len(toks) // 5 AS INT) - 1)) AS u(i)
        |  WHERE len(toks) >= 5),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1)
        |SELECT doc_id, count(*) AS n_segs,
        |       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |       round(avg(CASE WHEN n_docs >= 2 THEN 1.0 ELSE 0.0 END), 4) AS boiler_frac_r
        |FROM s JOIN df USING (seg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ---- batch 11 ------------------------------------------------------------
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' AND value > 150
        |                  THEN 1 ELSE 0 END) AS conv,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS bucket
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN bucket = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN bucket = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN bucket = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN bucket = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, n_b, conv_a, conv_b,
        |       round(conv_a / n_a, 4) AS rate_a_r,
        |       round(conv_b / n_b, 4) AS rate_b_r,
        |       CASE WHEN (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b)
        |            THEN round((conv_a / n_a - conv_b / n_b) /
        |                 sqrt(((conv_a + conv_b) / (n_a + n_b)) *
        |                      (1 - (conv_a + conv_b) / (n_a + n_b)) *
        |                      (1.0 / n_a + 1.0 / n_b)), 4)
        |            END AS z_r
        |FROM c""".stripMargin,

    "q_snapshot_diff" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |o AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |n AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE user_id % 53 <> 0 GROUP BY 1)
        |SELECT user_id,
        |       o.n_events AS old_n_events, o.sum_v_r AS old_sum_v_r,
        |       n.n_events AS new_n_events, n.sum_v_r AS new_sum_v_r,
        |       CASE WHEN o.user_id IS NULL THEN 'added'
        |            WHEN n.user_id IS NULL THEN 'removed'
        |            WHEN o.n_events IS NOT DISTINCT FROM n.n_events
        |             AND o.sum_v_r IS NOT DISTINCT FROM n.sum_v_r THEN 'same'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_seasonality" ->
      """WITH c AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS hod,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hod, n,
        |       round(n / sum(n) OVER (PARTITION BY dow), 4) AS share_r
        |FROM c ORDER BY dow, hod""".stripMargin,

    "q_json_intake" ->
      """SELECT CASE WHEN event_id % 13 = 0 THEN 'corrupt'
        |            ELSE event_type END AS bucket,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_sink_zorder" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_sim_lsh" -> {
      // generated, not hand-written: the plane matrix must be the
      // SAME doubles the Spark query uses (Scala's toString is the
      // shortest round-trip representation, so DuckDB parses back the
      // identical binary double)
      val planes = graft.ops.Sim.gaussianPlanes(dim = 64, nPlanes = 8)
      val terms = planes.zipWithIndex.map { case (p, i) =>
        val lits = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), $lits) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""SELECT vec_id, CAST($terms AS BIGINT) AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    "q_topk_groups" ->
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |         CAST(row_number() OVER (
        |           PARTITION BY event_type
        |           ORDER BY value DESC, event_id ASC) AS BIGINT) AS rnk
        |  FROM events)
        |SELECT event_type, rnk, round(value, 4) AS value_r, event_id
        |FROM r WHERE rnk <= 5
        |ORDER BY event_type, rnk""".stripMargin,

    "q_json_keys" ->
      """WITH r AS (
        |  SELECT CASE WHEN event_id % 11 = 0 THEN '{not json'
        |              WHEN event_id % 5 = 0 THEN '{"tag": "' || event_type ||
        |                   '", "n": ' || CAST(event_id % 7 AS VARCHAR) || '}'
        |              ELSE props END AS raw
        |  FROM events),
        |t AS (SELECT count(*) AS total FROM r),
        |kv AS (
        |  SELECT k AS key,
        |         json_extract_string(raw, '$.' || k) AS val
        |  FROM r, unnest(json_keys(
        |         CASE WHEN json_valid(raw) THEN raw ELSE '{}' END)) AS u(k))
        |SELECT key, count(*) AS n_rows,
        |       CAST(count(DISTINCT val) AS BIGINT) AS n_vals,
        |       round(count(*) / max(total), 4) AS share_r
        |FROM kv CROSS JOIN t
        |GROUP BY key ORDER BY key""".stripMargin,

    // ---- batch 12 ----

    "q_mix_temperature" ->
      """WITH per AS (
        |  SELECT source,
        |         count(*) AS n_docs,
        |         CAST(sum(len(list_filter(string_split(text, ' '), t -> t != ''))) AS BIGINT)
        |           AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
        |         sum(pow(CAST(n_tokens AS DOUBLE), 0.5)) AS tot_pow
        |  FROM per)
        |SELECT source, n_docs, n_tokens,
        |       round(n_tokens / tot_tokens, 6) AS raw_share_r,
        |       round(pow(CAST(n_tokens AS DOUBLE), 0.5) / tot_pow, 6) AS temp_weight_r,
        |       round(pow(CAST(n_tokens AS DOUBLE), 0.5) / tot_pow
        |             * tot_tokens / n_tokens, 4) AS epochs_r
        |FROM per, tot ORDER BY source""".stripMargin,

    "q_quality_norm" ->
      """WITH med AS (
        |  SELECT source, quantile_cont(n_chars, 0.5) AS m
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars,
        |       round(percent_rank() OVER (PARTITION BY d.source ORDER BY d.n_chars), 6)
        |         AS pr_r,
        |       CAST(CASE WHEN d.n_chars >= med.m THEN 1 ELSE 0 END AS BIGINT)
        |         AS above_median,
        |       round(med.m, 4) AS grp_median_r
        |FROM documents d JOIN med USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_rows,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_subjects,
        |         round(sum(value), 4) AS sum_v
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, day, n_rows, n_subjects,
        |       CASE WHEN n_subjects >= 55 THEN sum_v END AS sum_v_released,
        |       CAST(CASE WHEN n_subjects >= 55 THEN 0 ELSE 1 END AS BIGINT)
        |         AS suppressed
        |FROM g ORDER BY event_type, day""".stripMargin,

    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token FROM (
        |    SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token)
        |  WHERE df >= 100)
        |SELECT t.doc_id,
        |       count(*) AS n_tok,
        |       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 6) AS oov_rate_r
        |FROM tok t LEFT JOIN vocab v USING (token)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT doc_id + 100000 AS doc_id, text FROM corpus WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, text || ' zz8 zz8' FROM corpus
        |  WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id + 300000 AS doc_id, text || ' zz8 zz8' FROM corpus
        |  WHERE doc_id % 3 = 1),
        |hashed AS (
        |  SELECT doc_id, md5(text) AS h,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |  FROM batch),
        |idx AS (SELECT DISTINCT md5(text) AS h FROM corpus)
        |SELECT b.doc_id,
        |       CAST(CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS dup_of_corpus,
        |       CAST(CASE WHEN b.rn > 1 THEN 1 ELSE 0 END AS BIGINT) AS dup_in_batch,
        |       CAST(CASE WHEN i.h IS NULL AND b.rn = 1 THEN 1 ELSE 0 END AS BIGINT)
        |         AS keep
        |FROM hashed b LEFT JOIN idx i USING (h)
        |ORDER BY b.doc_id""".stripMargin,

    "q_overlap_matrix" ->
      """WITH tok AS (
        |  SELECT source, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM documents),
        |shx AS (
        |  SELECT source, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |ss AS (
        |  SELECT DISTINCT source,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |sz AS (SELECT source, count(*) AS n FROM ss GROUP BY source),
        |inter AS (
        |  SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_shared
        |  FROM ss x JOIN ss y ON x.h = y.h AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, i.n_shared,
        |       a.n AS n_a, b.n AS n_b,
        |       round(i.n_shared / CAST(a.n + b.n - i.n_shared AS DOUBLE), 6)
        |         AS jaccard_r
        |FROM inter i
        |JOIN sz a ON a.source = i.src_a
        |JOIN sz b ON b.source = i.src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // ---- batch 17 ----

    "q_dedup_url" ->
      """WITH d AS (SELECT doc_id, doc_id // 3 AS page FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         'src' || CAST(page % 20 AS VARCHAR) || '.example.com/page/'
        |           || CAST(page AS VARCHAR) AS canon
        |  FROM d),
        |g AS (
        |  SELECT canon, min(doc_id) AS keep_id, count(*) AS n_variants
        |  FROM c GROUP BY canon)
        |SELECT c.doc_id, c.canon, g.keep_id,
        |       CAST(g.n_variants AS BIGINT) AS n_variants,
        |       CAST(CASE WHEN c.doc_id = g.keep_id THEN 1 ELSE 0 END AS BIGINT)
        |         AS keep
        |FROM c JOIN g USING (canon) ORDER BY c.doc_id""".stripMargin,

    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
        |md AS (SELECT quantile_cont(abs(n - m.med), 0.5) AS mad FROM daily, m)
        |SELECT day, n, round(m.med, 4) AS med_r, round(md.mad, 4) AS mad_r,
        |       CASE WHEN md.mad > 0
        |            THEN round((n - m.med) / (1.4826 * md.mad), 4) END
        |         AS robust_z_r,
        |       CAST(CASE WHEN abs(CASE WHEN md.mad > 0
        |                  THEN round((n - m.med) / (1.4826 * md.mad), 4) END) > 3.0
        |            THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM daily, m, md ORDER BY day""".stripMargin,

    "q_ppl_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |tf AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM tf),
        |scored AS (
        |  SELECT t.doc_id, count(*) AS n_toks,
        |         round(avg(ln(tf.freq / tot.total)), 4) AS logprob
        |  FROM tok t JOIN tf USING (token), tot
        |  GROUP BY t.doc_id),
        |b AS (
        |  SELECT s.doc_id, d.source, s.n_toks, s.logprob,
        |         ntile(3) OVER (PARTITION BY d.source
        |           ORDER BY s.logprob DESC, s.doc_id) AS b
        |  FROM scored s JOIN documents d USING (doc_id))
        |SELECT doc_id, source, n_toks, logprob,
        |       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |              ELSE 'tail' END AS bucket
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_cdc_apply" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE user_id IS NOT NULL),
        |base AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1704844800000000 GROUP BY 1),
        |c1 AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e WHERE ts_us < 1705276800000000 GROUP BY 1),
        |c1k AS (SELECT DISTINCT user_id FROM e
        |        WHERE ts_us >= 1704844800000000 AND ts_us < 1705276800000000),
        |c2 AS (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_v_r
        |  FROM e GROUP BY 1),
        |c2k AS (SELECT DISTINCT user_id FROM e WHERE ts_us >= 1705276800000000),
        |winner AS (
        |  -- last writer per key: seq 2 (late update) beats seq 1; the
        |  -- delete (seq 3) beats both
        |  SELECT coalesce(c2.user_id, c1.user_id) AS user_id,
        |         CASE WHEN c2.user_id IS NOT NULL THEN c2.n_events
        |              ELSE c1.n_events END AS n_events,
        |         CASE WHEN c2.user_id IS NOT NULL THEN c2.sum_v_r
        |              ELSE c1.sum_v_r END AS sum_v_r
        |  FROM (SELECT c1.* FROM c1 JOIN c1k USING (user_id)) c1
        |  FULL OUTER JOIN (SELECT c2.* FROM c2 JOIN c2k USING (user_id)) c2
        |    ON c1.user_id = c2.user_id)
        |SELECT coalesce(w.user_id, b.user_id) AS user_id,
        |       CASE WHEN w.user_id IS NOT NULL THEN w.n_events
        |            ELSE b.n_events END AS n_events,
        |       CASE WHEN w.user_id IS NOT NULL THEN w.sum_v_r
        |            ELSE b.sum_v_r END AS sum_v_r
        |FROM base b FULL OUTER JOIN winner w ON b.user_id = w.user_id
        |-- every key in play has events, so the delete batch covers all
        |-- user_id % 7 = 0 keys exactly
        |WHERE coalesce(w.user_id, b.user_id) % 7 != 0
        |ORDER BY user_id""".stripMargin,

    // ---- batch 16 ----

    "q_kl_sources" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |stot AS (SELECT source, sum(c) AS s_tot FROM st GROUP BY 1),
        |ctok AS (SELECT token, sum(c) AS t_tot FROM st GROUP BY 1),
        |g AS (SELECT CAST(sum(c) AS DOUBLE) AS g_tot FROM st)
        |SELECT st.source,
        |       CAST(max(stot.s_tot) AS BIGINT) AS n_tokens,
        |       round(sum(st.c / stot.s_tot
        |             * ln(st.c / stot.s_tot / (ctok.t_tot / g.g_tot))), 6) AS kl_r
        |FROM st
        |JOIN ctok USING (token) JOIN stot USING (source) CROSS JOIN g
        |GROUP BY st.source ORDER BY st.source""".stripMargin,

    "q_zipf" ->
      """WITH freq AS (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |      AS token
        |    FROM documents) GROUP BY token),
        |ranked AS (
        |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
        |            AS DOUBLE)) AS lr,
        |         ln(CAST(freq AS DOUBLE)) AS lf
        |  FROM freq)
        |SELECT count(*) AS n_vocab,
        |       round(regr_slope(lf, lr), 4) AS slope_r,
        |       round(regr_r2(lf, lr), 4) AS r2_r
        |FROM ranked""".stripMargin,

    "q_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, token, count(*) AS c FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |             AS token
        |    FROM documents) GROUP BY doc_id, token)
        |SELECT token, count(*) AS df, CAST(sum(c) AS BIGINT) AS cf,
        |       round(avg(c), 4) AS mean_r,
        |       round(var_samp(c) / avg(c), 4) AS dispersion_r
        |FROM dt GROUP BY token ORDER BY token""".stripMargin,

    // ---- batch 15 ----

    "q_hash_embed" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != ''))
        |    AS token
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS bucket,
        |         ('0x' || substr(md5(token), 9, 1))::BIGINT % 2 * 2 - 1 AS sign
        |  FROM tok)
        |SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS v
        |FROM hashed GROUP BY doc_id, bucket
        |HAVING sum(sign) != 0
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_skipgrams" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT toks, i FROM t, unnest(generate_series(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2),
        |pairs AS (
        |  SELECT toks[i] AS center, toks[i + o.o] AS context
        |  FROM pos, (SELECT unnest([-2, -1, 1, 2]) AS o) o
        |  WHERE i + o.o >= 1 AND i + o.o <= len(toks))
        |SELECT center, context, count(*) AS n_pairs
        |FROM pairs GROUP BY center, context
        |ORDER BY center, context""".stripMargin,

    "q_reservoir" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |         row_number() OVER (
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

    // ---- batch 14 ----

    "q_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i AS pos,
        |         concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]) AS gram,
        |         len(toks) - 2 AS m
        |  FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
        |  WHERE len(toks) >= 3),
        |h AS (
        |  SELECT doc_id, pos, m,
        |         ('0x' || substr(md5(gram), 1, 8))::BIGINT % 2147483647 AS hh
        |  FROM g),
        |sel AS (
        |  SELECT doc_id, pos, m,
        |         min({'h': hh, 'p': pos}) OVER (
        |           PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS s
        |  FROM h)
        |SELECT DISTINCT doc_id, s.p AS fp_pos, s.h AS fp_h
        |FROM sel WHERE pos <= m - 3
        |ORDER BY doc_id, fp_pos""".stripMargin,

    "q_pit_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL),
        |trans AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts_us, event_id) AS prev
        |  FROM e),
        |vers AS (
        |  SELECT user_id, ts_us AS valid_from, event_type,
        |         CAST(row_number() OVER (PARTITION BY user_id
        |           ORDER BY valid_from, event_id) AS BIGINT) AS version
        |  FROM trans WHERE prev IS NULL OR prev != event_type),
        |facts AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT f.event_id, f.user_id, f.ts_us, v.version, v.event_type,
        |         row_number() OVER (PARTITION BY f.event_id
        |           ORDER BY v.valid_from DESC, v.version DESC) AS rn
        |  FROM facts f LEFT JOIN vers v
        |    ON v.user_id = f.user_id AND v.valid_from <= f.ts_us)
        |SELECT event_id, user_id, ts_us, version AS dim_version,
        |       event_type AS dim_event_type
        |FROM m WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
        |           AS BIGINT) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tok,
        |         CAST(ntile(8) OVER (ORDER BY n_tok, doc_id) AS BIGINT) AS bucket
        |  FROM t)
        |SELECT bucket, count(*) AS n_docs,
        |       min(n_tok) AS min_tok, max(n_tok) AS max_tok,
        |       round(avg(n_tok), 4) AS avg_tok_r,
        |       round(1.0 - round(avg(n_tok), 4) / max(n_tok), 4) AS pad_waste_r
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, rnk FROM r
        |ORDER BY rnk, source, doc_id LIMIT 100""".stripMargin,

    "q_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents),
        |s AS (
        |  SELECT doc_id, md5(text) AS h,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT
        |           / 4294967296.0 AS u
        |  FROM corpus),
        |sp AS (
        |  SELECT doc_id, h,
        |         CASE WHEN u < 0.9 THEN 'train'
        |              WHEN u < 0.95 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM s)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |       a.split AS split_a, b.split AS split_b
        |FROM sp a JOIN sp b
        |  ON a.h = b.h AND a.doc_id < b.doc_id AND a.split != b.split
        |ORDER BY a, b""".stripMargin,

    // ---- batch 13 ----

    "q_textrank" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c FROM bi WHERE w1 != w2 GROUP BY 1, 2),
        |edges AS (
        |  SELECT src, dst, sum(c) AS w FROM (
        |    SELECT w1 AS src, w2 AS dst, c FROM bc
        |    UNION ALL
        |    SELECT w2 AS src, w1 AS dst, c FROM bc)
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1),
        |contrib AS (
        |  SELECT e.src, e.dst, e.w / o.w_out AS frac
        |  FROM edges e JOIN ow o USING (src)),
        |nodes AS (SELECT DISTINCT src AS token FROM contrib),
        |s0 AS (SELECT token, CAST(1.0 AS DOUBLE) AS s FROM nodes),
        |i1 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s0 p ON p.token = c.src GROUP BY c.dst),
        |s1 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i1 i ON i.dst = n.token),
        |i2 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s1 p ON p.token = c.src GROUP BY c.dst),
        |s2 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i2 i ON i.dst = n.token),
        |i3 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s2 p ON p.token = c.src GROUP BY c.dst),
        |s3 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i3 i ON i.dst = n.token),
        |i4 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s3 p ON p.token = c.src GROUP BY c.dst),
        |s4 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i4 i ON i.dst = n.token),
        |i5 AS (SELECT c.dst, sum(c.frac * p.s) AS in_s
        |       FROM contrib c JOIN s4 p ON p.token = c.src GROUP BY c.dst),
        |s5 AS (SELECT n.token, 0.15 + 0.85 * coalesce(i.in_s, 0) AS s
        |       FROM nodes n LEFT JOIN i5 i ON i.dst = n.token)
        |SELECT token, round(s, 4) AS score_r FROM s5
        |ORDER BY token""".stripMargin,

    "q_hard_negatives" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |      FROM n WHERE vec_id < 10),
        |sc AS (
        |  SELECT q.q_id, c.vec_id AS c_id, c.label AS c_label,
        |         round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 4) AS cos_r
        |  FROM q JOIN n c ON c.label != q.q_label),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
        |                    ORDER BY cos_r DESC, c_id ASC) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT q_id, c_id, c_label, cos_r, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_knn_vote" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv, nrm AS qn
        |      FROM n WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv, nrm AS cn
        |      FROM n WHERE vec_id % 10 != 0),
        |sc AS (
        |  SELECT q_id, q_label, c_id, c_label,
        |         round(list_dot_product(qv, cv) / (qn * cn), 4) AS cos_r
        |  FROM q, c),
        |top AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |                ORDER BY cos_r DESC, c_id ASC) AS rnk
        |    FROM sc) WHERE rnk <= 5),
        |votes AS (
        |  SELECT q_id, q_label, c_label, count(*) AS votes
        |  FROM top GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |              ORDER BY votes DESC, c_label ASC) AS vr
        |  FROM votes)
        |SELECT q_id AS vec_id, q_label AS label, c_label AS pred_label, votes,
        |       CAST(CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS BIGINT)
        |         AS correct
        |FROM best WHERE vr = 1 ORDER BY vec_id""".stripMargin,

    "q_embed_proto" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM e),
        |cd AS (SELECT label, i, avg(x) AS cx FROM d GROUP BY label, i),
        |cl AS (SELECT label, list(cx ORDER BY i) AS cv FROM cd GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label,
        |         round(list_dot_product(e.v, cl.cv)
        |               / (sqrt(list_dot_product(e.v, e.v))
        |                  * sqrt(list_dot_product(cl.cv, cl.cv))), 4) AS cos_r
        |  FROM e JOIN cl USING (label))
        |SELECT vec_id, label, cos_r,
        |       CAST(row_number() OVER (PARTITION BY label
        |              ORDER BY cos_r DESC, vec_id ASC) AS BIGINT) AS proto_rnk
        |FROM scored ORDER BY vec_id""".stripMargin,

    // ---- batch 18 ----

    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
        |         round(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 4)
        |           AS distinct_ratio
        |  FROM t),
        |pos AS (
        |  SELECT doc_id, toks, i
        |  FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
        |runs AS (
        |  SELECT doc_id, toks[i] AS tok,
        |         i - row_number() OVER (PARTITION BY doc_id, toks[i] ORDER BY i) AS g
        |  FROM pos),
        |rl AS (SELECT doc_id, count(*) AS r FROM runs GROUP BY doc_id, tok, g),
        |mr AS (SELECT doc_id, CAST(max(r) AS BIGINT) AS max_run FROM rl GROUP BY doc_id),
        |bg AS (SELECT doc_id, toks[i] AS p, toks[i + 1] AS n
        |       FROM pos WHERE i < len(toks)),
        |bgc AS (SELECT doc_id, count(*) AS c FROM bg GROUP BY doc_id, p, n),
        |bgm AS (SELECT doc_id, max(c) AS mc FROM bgc GROUP BY doc_id)
        |SELECT b.doc_id, b.n_toks, b.distinct_ratio, mr.max_run,
        |       coalesce(round(2.0 * bgm.mc / b.n_toks, 4), 0.0) AS top_bigram_frac
        |FROM base b JOIN mr USING (doc_id) LEFT JOIN bgm USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "q_lm_interp" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM dt, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |db AS (SELECT doc_id, prev, next, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |lk AS (SELECT prev, next, CAST(sum(c) AS BIGINT) AS bc FROM db GROUP BY 1, 2),
        |lk2 AS (SELECT prev, next, bc,
        |        CAST(sum(bc) OVER (PARTITION BY prev) AS BIGINT) AS cc FROM lk),
        |uni AS (SELECT next, CAST(sum(c) AS BIGINT) AS uc FROM db GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM db)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |       round(sum(db.c * ln(0.7 * bc / cc + (1 - 0.7) * uc / tt)) / sum(db.c), 4)
        |         AS interp_logprob
        |FROM db JOIN lk2 USING (prev, next) JOIN uni USING (next), tot
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,

    // derivation oracle: the Spark side ENCODES and DECODES real PPM
    // bytes; the oracle restates the channel statistics the solid-color
    // construction implies, including the corrupt-every-10th quarantine
    "q_media_decode" ->
      """SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 2.0 END AS w,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 2.0 END AS h,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST(doc_id % 256 AS DOUBLE) END AS mean_r,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST((doc_id * 7) % 256 AS DOUBLE) END AS mean_g,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE CAST((doc_id * 13) % 256 AS DOUBLE) END AS mean_b,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL
        |            ELSE round(0.299 * (doc_id % 256) + 0.587 * ((doc_id * 7) % 256)
        |                       + 0.114 * ((doc_id * 13) % 256), 4) END AS luma_mean_r,
        |       CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 0.0 END AS luma_std_r
        |FROM documents ORDER BY media_id""".stripMargin,

    // square-wave derivation oracle: n samples at 8 kHz, period 8 →
    // duration n/8000, rms amp/2^15 (exact), flips floor((n-1)/4)
    "q_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 800 + (doc_id % 5) * 400 AS n,
        |         500 + (doc_id % 100) * 100 AS amp
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST(n AS DOUBLE) / 8000 END AS dur_sec,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST(amp AS DOUBLE) / 32768 END AS rms,
        |       CASE WHEN doc_id % 7 = 0 THEN NULL
        |            ELSE CAST((n - 1) // 4 AS DOUBLE) / (CAST(n AS DOUBLE) / 8000) END AS zcr
        |FROM d ORDER BY media_id""".stripMargin,

    "q_ngram_novelty" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |first AS (SELECT h, min(doc_id) AS first_id FROM hx GROUP BY h)
        |SELECT hx.doc_id,
        |       count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN f.first_id = hx.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_novel,
        |       round(sum(CASE WHEN f.first_id = hx.doc_id THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 6) AS novelty_r
        |FROM hx JOIN first f USING (h)
        |GROUP BY hx.doc_id ORDER BY hx.doc_id""".stripMargin,

    "q_recency_score" ->
      """SELECT user_id,
        |       count(*) AS n_events,
        |       max(epoch_us(ts)) AS last_seen_us,
        |       round(sum(value / power(2, floor(
        |         ((1705708800000000 - epoch_us(ts)) / 86400000000.0) / 2.0))), 4)
        |         AS recency_score_r
        |FROM events
        |WHERE user_id IS NOT NULL AND epoch_us(ts) <= 1705708800000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- batch 19 ----

    // occurrence key doc_id*1e6 + (line-1)*1e3 + chunk matches the
    // Spark side's packed (doc, line, chunk) total order (Spark lines
    // are 0-based posexplode; generate_series here is 1-based)
    "q_dedup_lines" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |ln AS (
        |  SELECT doc_id, li,
        |         list_filter(string_split(lines[li], ' '), t -> t != '') AS toks
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
        |       unnest(generate_series(1, len(lines))) AS u(li)),
        |seg AS (
        |  SELECT doc_id, li, si,
        |         array_to_string(list_slice(toks, si * 8 + 1, si * 8 + 8), ' ') AS seg
        |  FROM ln, unnest(generate_series(0, (len(toks) - 1) // 8)) AS v(si)
        |  WHERE len(toks) >= 1),
        |keyed AS (
        |  SELECT doc_id, seg,
        |         doc_id * 1000000 + (li - 1) * 1000 + si AS k
        |  FROM seg),
        |firsts AS (
        |  SELECT doc_id, k, min(k) OVER (PARTITION BY seg) AS first_k FROM keyed)
        |SELECT doc_id,
        |       count(*) AS n_segs,
        |       CAST(sum(CASE WHEN k <> first_k THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       round(sum(CASE WHEN k <> first_k THEN 1 ELSE 0 END)
        |             / CAST(count(*) AS DOUBLE), 4) AS dup_frac
        |FROM firsts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_sparse_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
        |wt AS (
        |  SELECT doc_id, token, tf * ln(n / df) AS w
        |  FROM tf JOIN df USING (token), nd
        |  WHERE df <= n * 0.85),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wt GROUP BY 1),
        |unitv AS (
        |  SELECT wt.doc_id, token, w / nrm AS wn
        |  FROM wt JOIN nrm USING (doc_id)),
        |scored AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |         CAST(count(*) AS BIGINT) AS n_common,
        |         round(sum(q.wn * c.wn), 4) AS cos_r
        |  FROM unitv q JOIN unitv c USING (token)
        |  WHERE q.doc_id < 20 AND c.doc_id <> q.doc_id
        |  GROUP BY 1, 2)
        |SELECT q_id, c_id, n_common, cos_r, rnk FROM (
        |  SELECT q_id, c_id, n_common, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_kn_bigram" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i + 1] AS next
        |  FROM dt, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2),
        |db AS (SELECT doc_id, prev, next, count(*) AS c FROM pos GROUP BY 1, 2, 3),
        |lk AS (SELECT prev, next, CAST(sum(c) AS BIGINT) AS bc FROM db GROUP BY 1, 2),
        |lk2 AS (SELECT prev, next, bc,
        |        CAST(sum(bc) OVER (PARTITION BY prev) AS BIGINT) AS cc,
        |        CAST(count(*) OVER (PARTITION BY prev) AS BIGINT) AS n1p
        |        FROM lk),
        |cont AS (SELECT next, CAST(count(*) AS BIGINT) AS ncont FROM lk GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS ttypes FROM lk)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |       round(sum(db.c * ln(greatest(bc - 0.75, 0) / cc
        |             + (0.75 * n1p / cc) * (ncont / CAST(ttypes AS DOUBLE))))
        |             / sum(db.c), 4) AS kn_logprob
        |FROM db JOIN lk2 USING (prev, next) JOIN cont USING (next), tot
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin,

    "q_l_diversity" ->
      """WITH g AS (
        |  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |         count(*) AS n_rows,
        |         count(DISTINCT user_id) AS n_subjects,
        |         count(DISTINCT CAST(floor(value / 100) AS BIGINT)) AS n_sensitive,
        |         round(sum(value), 4) AS sum_v
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, day, n_rows, n_subjects, n_sensitive,
        |       CASE WHEN n_subjects >= 50 AND n_sensitive >= 3
        |            THEN sum_v END AS sum_v_released,
        |       CAST(CASE WHEN n_subjects >= 50 AND n_sensitive >= 3
        |            THEN 0 ELSE 1 END AS BIGINT) AS suppressed
        |FROM g ORDER BY event_type, day""".stripMargin,

    // SQ8 shortlist in the QUANTIZED domain: both sides become
    // round(x/scale) int8 codes from the same per-vector max-abs
    // scale the Spark index stores; scales cancel out of the cosine,
    // so the shortlist score is the pure integer-code cosine (every
    // dot term |c| <= 127^2, the sum is an exact integer in a double,
    // so the 6dp rank boundary is engine-independent)
    "q_sim_sq" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sq AS (
        |  SELECT vec_id, v,
        |         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |              ELSE list_max(list_transform(v, x -> abs(x))) / 127 END AS scale
        |  FROM e),
        |cd AS (
        |  SELECT vec_id, v,
        |         list_transform(v, x -> round(x / scale)) AS codes
        |  FROM sq),
        |n AS (
        |  SELECT vec_id, v, codes,
        |         sqrt(list_dot_product(v, v)) AS nrm,
        |         sqrt(list_dot_product(codes, codes)) AS cn
        |  FROM cd),
        |adc AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |         round(list_dot_product(q.codes, c.codes) / (q.cn * c.cn), 6) AS adc_r
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |short AS (
        |  SELECT q_id, c_id FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id
        |                              ORDER BY adc_r DESC, c_id) AS srnk
        |    FROM adc) WHERE srnk <= 20),
        |re AS (
        |  SELECT s.q_id, s.c_id,
        |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos_r
        |  FROM short s JOIN n q ON q.vec_id = s.q_id JOIN n c ON c.vec_id = s.c_id)
        |SELECT q_id, c_id, cos_r, rnk FROM (
        |  SELECT q_id, c_id, cos_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY cos_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM re) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    // derivation oracle: the Spark side ENCODES 16x16 PPMs, DECODES,
    // resizes to 8x8 and thresholds luma; the oracle restates the
    // bijective bit pattern ((i*31 + seed) % 64 < 32) from doc_id
    "q_media_phash" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 9 = 0 THEN NULL
        |              ELSE array_to_string(list_transform(generate_series(0, 63),
        |                     i -> CASE WHEN (i * 31 + (doc_id % 5) * 13) % 64 < 32
        |                               THEN '1' ELSE '0' END), '')
        |         END AS ahash
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 1 END AS BIGINT) AS decoded,
        |       ahash,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0
        |            ELSE count(*) OVER (PARTITION BY ahash) END AS BIGINT) AS group_n,
        |       CAST(CASE WHEN doc_id % 9 = 0 THEN 0
        |            WHEN doc_id = min(doc_id) OVER (PARTITION BY ahash) THEN 1
        |            ELSE 0 END AS BIGINT) AS keep
        |FROM hx ORDER BY media_id""".stripMargin,

    // ---- batch 20 ----

    "q_bm25" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |q AS (SELECT doc_id AS q_id, token FROM tf WHERE doc_id < 20),
        |scored AS (
        |  SELECT q.q_id, tf.doc_id AS c_id,
        |         CAST(count(*) AS BIGINT) AS n_common,
        |         round(sum(ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |               * (tf.tf * (1.2 + 1.0)
        |                  / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / avgdl)))), 4)
        |           AS bm25_r
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        |       JOIN q USING (token), st
        |  WHERE q.q_id <> tf.doc_id
        |  GROUP BY 1, 2)
        |SELECT q_id, c_id, n_common, bm25_r, rnk FROM (
        |  SELECT q_id, c_id, n_common, bm25_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY bm25_r DESC, c_id) AS BIGINT) AS rnk
        |  FROM scored)
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,

    "q_rrf" ->
      """WITH tf AS (
        |  SELECT doc_id, tok AS token, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
        |wt AS (
        |  SELECT doc_id, token, tf * ln(n / df) AS w
        |  FROM tf JOIN df USING (token), nd
        |  WHERE df <= n * 0.85),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wt GROUP BY 1),
        |unitv AS (
        |  SELECT wt.doc_id, token, w / nrm AS wn
        |  FROM wt JOIN nrm USING (doc_id)),
        |s1 AS (
        |  SELECT q.doc_id AS q_id, c.doc_id AS c_id,
        |         round(sum(q.wn * c.wn), 4) AS s
        |  FROM unitv q JOIN unitv c USING (token)
        |  WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id
        |  GROUP BY 1, 2),
        |r1 AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rnk
        |    FROM s1) WHERE rnk <= 20),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
        |q2 AS (SELECT doc_id AS q_id, token FROM tf WHERE doc_id < 10),
        |s2 AS (
        |  SELECT q2.q_id, tf.doc_id AS c_id,
        |         round(sum(ln(1.0 + (st.n - df + 0.5) / (df + 0.5))
        |               * (tf.tf * (1.2 + 1.0)
        |                  / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / avgdl)))), 4)
        |           AS s
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        |       JOIN q2 USING (token), st
        |  WHERE q2.q_id <> tf.doc_id
        |  GROUP BY 1, 2),
        |r2 AS (
        |  SELECT q_id, c_id, rnk FROM (
        |    SELECT q_id, c_id,
        |           row_number() OVER (PARTITION BY q_id ORDER BY s DESC, c_id) AS rnk
        |    FROM s2) WHERE rnk <= 20),
        |u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
        |f AS (
        |  SELECT q_id, c_id, CAST(count(*) AS BIGINT) AS n_lists,
        |         round(sum(1.0 / (60.0 + rnk)), 6) AS rrf_r
        |  FROM u GROUP BY 1, 2)
        |SELECT q_id, c_id, n_lists, rrf_r, fused_rnk FROM (
        |  SELECT q_id, c_id, n_lists, rrf_r,
        |         CAST(row_number() OVER (PARTITION BY q_id
        |                                 ORDER BY rrf_r DESC, c_id) AS BIGINT)
        |           AS fused_rnk
        |  FROM f)
        |WHERE fused_rnk <= 5 ORDER BY q_id, fused_rnk""".stripMargin,

    // the salted plan's contract: result set IDENTICAL to the plain
    // unsalted join — so the oracle IS the plain join
    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
        |         round(sum(value), 4) AS sum_v_r
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, d.n_t, d.sum_v_r
        |FROM events e JOIN dim d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "q_maxsim" ->
      """WITH t AS (
        |  SELECT vec_id // 4 AS did, vec_id AS tid,
        |         CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |n AS (SELECT did, tid, v, sqrt(list_dot_product(v, v)) AS nrm FROM t),
        |pt AS (
        |  SELECT q.did AS q_doc, c.did AS c_doc, q.tid AS q_idx,
        |         max(round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6)) AS best
        |  FROM n q JOIN n c ON q.did < 5 AND c.did >= 5
        |  GROUP BY 1, 2, 3),
        |sc AS (
        |  SELECT q_doc, c_doc, round(sum(best), 4) AS maxsim_r
        |  FROM pt GROUP BY 1, 2)
        |SELECT q_doc, c_doc, maxsim_r, rnk FROM (
        |  SELECT q_doc, c_doc, maxsim_r,
        |         CAST(row_number() OVER (PARTITION BY q_doc
        |                                 ORDER BY maxsim_r DESC, c_doc) AS BIGINT) AS rnk
        |  FROM sc)
        |WHERE rnk <= 5 ORDER BY q_doc, rnk""".stripMargin,

    // derivation oracle: hashes restated from doc_id (base pattern +
    // odd-id single-bit flip), then the SAME band-bucket candidate
    // join and bit-level hamming verify DuckDB-side
    "q_media_phash_band" ->
      """WITH hx AS (
        |  SELECT doc_id,
        |         array_to_string(list_transform(generate_series(0, 63), i ->
        |           CASE WHEN (xor(i * 144115188075855881,
        |                          (doc_id % 64) * 2654435761) % 97 < 48)
        |                     != (doc_id % 2 = 1 AND i = (doc_id // 64) % 64)
        |                THEN '1' ELSE '0' END), '') AS ahash
        |  FROM documents WHERE doc_id % 9 != 0 AND doc_id < 2000),
        |bx AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(0, 3), bi ->
        |           list_sum(list_transform(generate_series(0, 15), j ->
        |             CASE WHEN substr(ahash, bi * 16 + j + 1, 1) = '1'
        |                  THEN 1 << (15 - j) ELSE 0 END))) AS bints
        |  FROM hx),
        |banded AS (
        |  SELECT doc_id, bints, bi, bints[bi] AS bv
        |  FROM bx, unnest(generate_series(1, 4)) AS u(bi)),
        |cand AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, x.bints AS ba, y.bints AS bb,
        |         CAST(count(*) AS BIGINT) AS n_bands
        |  FROM banded x JOIN banded y
        |    ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |ham AS (
        |  SELECT a, b, n_bands,
        |         CAST(list_sum(list_transform(generate_series(1, 4), i ->
        |           bit_count(xor(CAST(ba[i] AS BIGINT), CAST(bb[i] AS BIGINT)))))
        |           AS BIGINT) AS hamming
        |  FROM cand)
        |SELECT a, b, n_bands, hamming FROM ham
        |WHERE hamming <= 2 ORDER BY a, b""".stripMargin,

    // ---- batch 21 ----

    "q_dedup_lines_trim" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents),
        |ln AS (
        |  SELECT doc_id, li,
        |         list_filter(string_split(lines[li], ' '), t -> t != '') AS toks
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
        |       unnest(generate_series(1, len(lines))) AS u(li)),
        |seg AS (
        |  SELECT doc_id, li, si,
        |         array_to_string(list_slice(toks, si * 8 + 1, si * 8 + 8), ' ') AS seg
        |  FROM ln, unnest(generate_series(0, (len(toks) - 1) // 8)) AS v(si)
        |  WHERE len(toks) >= 1),
        |keyed AS (
        |  SELECT doc_id, seg,
        |         doc_id * 1000000 + (li - 1) * 1000 + si AS k
        |  FROM seg),
        |firsts AS (
        |  SELECT doc_id, seg, k, min(k) OVER (PARTITION BY seg) AS first_k
        |  FROM keyed),
        |kept AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |         string_agg(seg, ' ' ORDER BY k) AS kept_text
        |  FROM firsts WHERE k = first_k GROUP BY doc_id)
        |SELECT c.doc_id,
        |       coalesce(k.n_kept, 0) AS n_kept,
        |       coalesce(k.kept_text, '') AS kept_text
        |FROM corpus c LEFT JOIN kept k USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // estimate side = the q_dedup_minhash_est machinery; exact side =
    // the q_dedup_ngram inverted-index join WITH its df>1000 skew cap
    // (mirrors the operator); collision-only candidates get true J = 0
    "q_minhash_error" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 2000
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz9 zz9' FROM documents
        |  WHERE doc_id < 2000),
        |tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
        |  FROM corpus),
        |shx AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))) AS shingle
        |  FROM tok),
        |hx AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
        |  FROM shx),
        |mh AS (
        |  SELECT doc_id, seeds.seed,
        |         min(((37 + 101 * seeds.seed) * h + 13 + 97 * seeds.seed) % 2147483647) AS mh
        |  FROM hx, (SELECT unnest(generate_series(0, 15)) AS seed) seeds
        |  GROUP BY doc_id, seeds.seed),
        |bands AS (
        |  SELECT doc_id, seed // 4 AS band_id,
        |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
        |  FROM mh GROUP BY doc_id, seed // 4),
        |cands AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band_id = y.band_id AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |est AS (
        |  SELECT c.a, c.b,
        |         round(CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16, 4)
        |           AS j_est
        |  FROM cands c
        |  JOIN mh ma ON ma.doc_id = c.a
        |  JOIN mh mb ON mb.doc_id = c.b AND mb.seed = ma.seed
        |  GROUP BY c.a, c.b),
        |hot AS (
        |  SELECT h FROM (SELECT h, count(*) AS df FROM hx GROUP BY h)
        |  WHERE df > 1000),
        |rare AS (SELECT * FROM hx WHERE h NOT IN (SELECT h FROM hot)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM hx GROUP BY doc_id),
        |common AS (
        |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
        |  FROM rare x JOIN rare y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT c.a, c.b, round(c.c / (sa.sz + sb.sz - c.c), 4) AS jt
        |  FROM common c
        |  JOIN sizes sa ON sa.doc_id = c.a
        |  JOIN sizes sb ON sb.doc_id = c.b),
        |joined AS (
        |  SELECT e.j_est, coalesce(x.jt, 0) AS jt
        |  FROM est e LEFT JOIN exact x USING (a, b))
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       round(avg(j_est), 4) AS mean_est,
        |       round(avg(jt), 4) AS mean_true,
        |       round(avg(abs(j_est - jt)), 4) AS mae,
        |       round(max(abs(j_est - jt)), 4) AS max_abs_err
        |FROM joined""".stripMargin,

    // derivation oracle: frame count / truncation / frame-order mean
    // luma / shot boundaries restated arithmetically from doc_id (the
    // alternating-gray construction makes every consecutive-frame luma
    // step exactly delta, far from the 64 threshold)
    "q_video_decode" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         3 + doc_id % 4 AS nf,
        |         doc_id % 120 AS base,
        |         30 + (doc_id % 10) * 10 AS delta,
        |         CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END AS trunc
        |  FROM documents),
        |m AS (SELECT doc_id, base, delta, trunc, nf - trunc AS mf FROM d),
        |lum AS (
        |  SELECT doc_id, mf, trunc, delta,
        |         list_transform(generate_series(0, mf - 1), f ->
        |           0.299 * (base + (f % 2) * delta)
        |             + 0.587 * (base + (f % 2) * delta)
        |             + 0.114 * (base + (f % 2) * delta)) AS ls
        |  FROM m)
        |SELECT doc_id AS media_id,
        |       CAST(mf AS BIGINT) AS n_frames,
        |       CAST(trunc AS BIGINT) AS truncated,
        |       round(list_sum(ls) / mf, 4) AS mean_luma_r,
        |       CAST(CASE WHEN delta > 64 THEN mf - 1 ELSE 0 END AS BIGINT) AS n_scenes
        |FROM lum ORDER BY media_id""".stripMargin,

    // derivation oracle: alternating speech/silence blocks aligned to
    // the VAD window — every odd window is silent, every even window
    // is one isolated speech segment of 0.05 s
    "q_audio_vad" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS nb,
        |         CASE WHEN doc_id % 6 = 0 THEN 0 ELSE 1 END AS dec
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST(dec AS BIGINT) AS decoded,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE nb END AS BIGINT) AS n_windows,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE (nb + 1) // 2 END AS BIGINT)
        |         AS n_speech,
        |       CAST(CASE WHEN dec = 0 THEN 0 ELSE (nb + 1) // 2 END AS BIGINT)
        |         AS n_segments,
        |       CASE WHEN dec = 0 THEN NULL
        |            ELSE round(((nb + 1) // 2) * 0.05, 4) END AS speech_sec_r
        |FROM d ORDER BY media_id""".stripMargin,

    // components = base groups exactly (every same-base pair is a
    // hamming ≤ 2 edge; the XOR-mixed patterns exclude cross-base
    // edges), so the transitive keeper is the group min over decoded ids
    "q_media_dedup_cc" ->
      """SELECT doc_id AS media_id,
        |       min(doc_id) OVER (PARTITION BY doc_id % 64) AS keep_id
        |FROM documents
        |WHERE doc_id % 9 != 0 AND doc_id < 2000
        |ORDER BY media_id""".stripMargin,

    "q_rfm" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         CAST(floor((1705708800000000 - max(epoch_us(ts))) / 86400000000.0)
        |              AS BIGINT) AS recency_days,
        |         count(*) AS frequency,
        |         round(sum(value), 4) AS monetary_r
        |  FROM events
        |  WHERE user_id IS NOT NULL AND epoch_us(ts) <= 1705708800000000
        |  GROUP BY user_id)
        |SELECT user_id, recency_days, frequency, monetary_r,
        |       CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS BIGINT)
        |         AS r_band,
        |       CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
        |         AS f_band,
        |       CAST(ntile(5) OVER (ORDER BY monetary_r DESC, user_id) AS BIGINT)
        |         AS m_band,
        |       concat_ws('-',
        |         ntile(5) OVER (ORDER BY recency_days, user_id),
        |         ntile(5) OVER (ORDER BY frequency DESC, user_id),
        |         ntile(5) OVER (ORDER BY monetary_r DESC, user_id)) AS segment
        |FROM pu ORDER BY user_id""".stripMargin
  )

  /** Oracle SQL whose text depends on an engine-built MODEL (data, not
    * code): generated at Verify time against the actual sfDir and
    * merged over [[oracleSql]] into oracle_sql.json. Today that is
    * `q_sim_ann_kmeans` — the deterministic driver-local k-means
    * training ([[ops.Sim.kmeansCentroidsSampledLocal]], identical call
    * to the query's) yields centroid literals the oracle embeds, and
    * DuckDB independently recomputes the entire multi-probe IVF search
    * from them (same trick as `q_sim_lsh`'s pinned hyperplanes).
    * Training QUALITY stays graded by KmeansIvfSpec's recall bound;
    * this closes the search path's oracle gap.
    */
  def oracleSqlDynamic(spark: SparkSession, sfDir: String): Map[String, String] = {
    val s = ensure(spark)
    // pqTrainLocal re-runs the identical deterministic centroid build
    // internally, so `cents` serves all three oracles consistently.
    val (cents, cbs) = ops.Sim.pqTrainLocal(
      Tables.embeddings(s, sfDir), nCells = 8, m = 8, ks = 16,
      iters = 4, sampleMod = 2)
    Map(
      "q_sim_ann_kmeans" ->
        ops.Sim.ivfSearchOracleSql(cents, nQueries = 10, k = 5, nProbe = 2),
      "q_dedup_semantic" ->
        ops.Sim.semanticDedupOracleSql(cents, minCos = 0.40),
      "q_sim_ann_pq" ->
        ops.Sim.ivfPqSearchOracleSql(cents, cbs, nQueries = 10, k = 5,
          nProbe = 2),
      "q_sim_ann_pq_refine" ->
        ops.Sim.ivfPqSearchOracleSql(cents, cbs, nQueries = 10, k = 5,
          nProbe = 2, refine = 20),
      "q_cluster_purity" ->
        ops.Sim.clusterPurityOracleSql(cents))
  }
}
