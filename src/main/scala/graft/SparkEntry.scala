package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{EventOps, Relational, Sim, Text, TimeFns}
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

  private def tmpDir(tag: String, sfDir: String): String = {
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/qtmp/${tag}_$sf"
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
      EventOps.timeRange(Tables.events(s, dir), D2024_01_10_US, D2024_01_20_US)
        .select(
          col("event_id"), col("ts_us"),
          date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("event_date"))
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
        .orderBy(col("event_type"))
    }),

    "q_agg_distinct" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.distinctUsersPerType(Tables.events(s, dir))
        .orderBy(col("event_type"))
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
        .orderBy(col("user_id"), col("event_type"))
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
      val out = EventOps.extractJsonLong(Tables.events(s, dir), "props", "k", "param_k")
        .select(
          col("event_id"), col("user_id"),
          date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("event_date"),
          col("ts_us"), col("event_type"), col("param_k"))
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_date", StringType), StructField("ts_us", LongType),
        StructField("event_type", StringType), StructField("param_k", LongType)))
      Sinks.csvRoundTrip(out, tmpDir("csv", dir), schema).orderBy(col("event_id"))
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
        .orderBy(col("user_id"), col("rn"))
    }),

    "q_window_lag" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.interEventGap(Tables.events(s, dir))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    "q_window_tumbling" -> ((s0, dir) => {
      val s = ensure(s0)
      Relational.hourlyCounts(Tables.events(s, dir))
        .orderBy(col("win_start"), col("event_type"))
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

    "q_text_stats" -> ((s0, dir) => {
      val s = ensure(s0)
      Text.corpusStats(Tables.documents(s, dir)).orderBy(col("lang"), col("source"))
    }),

    "q_sim_cosine_topk" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.cosineTopK(Tables.embeddings(s, dir), nQueries = 10, k = 5)
        .select(col("q_id"), col("c_id"), col("cos_r"), col("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    })
  )

  // ---------------------------------------------------------------------------
  // DuckDB oracle SQL — same tables, same column names, same row order.
  // ---------------------------------------------------------------------------

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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

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
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

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
        |FROM events ORDER BY user_id, rn""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

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
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
  )
}
