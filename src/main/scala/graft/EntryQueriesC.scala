package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Corpus, Dedup, EventOps, Multimodal, Mutations, Relational, Sim, Text, TimeFns}
import graft.etl.Sinks
import graft.Tables._
import graft.EntrySupport._

/** Declared query bodies, batches 8-12: set ops, spine/fill, diversity, merge/history,
  * warehouse diagnostics, experimentation, CDC, governance — split from SparkEntry behind the
  * same `queries` map (SURVEY.md §2.12 keys unchanged).
  */
private[graft] object EntryQueriesC {

  val map: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // container day as an integer epoch-day: session tz is pinned
      // UTC, so `ts_us div 86400e6` partitions identically to the
      // formatted yyyy-MM-dd string (the oracle's strftime day) while
      // skipping a per-row formatter — the key is internal to the
      // grouping and never reaches the output
      val ev = Tables.events(s, dir).withColumn(
        "day", expr("ts_us div 86400000000"))
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
      // scan fan-out: the hash-per-segment explode precedes the first
      // exchange and the corpus parquet is one split
      val withBanner = Tables.documents(s, dir)
        .repartition(fanN(s, dir))
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
          .repartition(fanEvHeavyN(s, dir)),
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

    "q_xml_intake" -> ((s0, dir) => {
      val s = ensure(s0)
      // PERMISSIVE intake of a dirty LINE-DELIMITED XML feed — the XML
      // twin of q_json_intake. Every 13th record carries a malformed
      // VALUE (a non-numeric event_id cell inside well-formed markup):
      // with multiLine=false the parser quarantines exactly that row to
      // _corrupt_record (a whole-document parse would swallow the rest
      // of the split — see Sinks.xmlPermissiveRead). event_type is
      // entity-escaped on construction so the feed itself stays
      // well-formed markup.
      val feed = tmpDir("dirty_xml", dir)
      val esc = (c: Column) =>
        regexp_replace(regexp_replace(regexp_replace(c,
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
      // a NULL field omits its element (the writer convention; reads
      // back as NULL) — concat over a raw NULL would null the LINE and
      // break the text sink
      val elem = (name: String, v: Column) =>
        when(v.isNull, lit("")).otherwise(
          concat(lit(s"<$name>"), v, lit(s"</$name>")))
      Sinks.ensureTextWritten(
        Tables.events(s, dir).select(concat(
          lit("<row>"),
          elem("event_id",
            when(col("event_id") % 13 === 0, concat(lit("x"), col("event_id")))
              .otherwise(col("event_id").cast("string"))),
          elem("event_type", esc(col("event_type"))),
          elem("user_id", col("user_id").cast("string")),
          elem("ts_us", col("ts_us").cast("string")),
          lit("</row>")).as("value"))
          .repartition(fanEvHeavyN(s, dir)),
        feed)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("user_id", LongType), StructField("ts_us", LongType)))
      Sinks.xmlPermissiveRead(s, feed, schema)
        .groupBy(
          when(col("_corrupt_record").isNotNull, lit("corrupt"))
            .otherwise(col("event_type")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    "q_csv_intake" -> ((s0, dir) => {
      val s = ensure(s0)
      // PERMISSIVE intake of a dirty CSV feed — the CSV member of the
      // dirty-feed trio (q_json_intake / q_xml_intake). Every 13th
      // line carries a non-numeric event_id cell; PERMISSIVE type
      // enforcement quarantines exactly that line to _corrupt_record.
      // event_type values are comma-free, so the unquoted writer is
      // unambiguous; a NULL user_id writes as an empty cell (reads
      // back NULL) — concat_ws would DROP the cell and shift the row.
      val feed = tmpDir("dirty_csv", dir)
      Sinks.ensureTextWritten(
        Tables.events(s, dir).select(concat_ws(",",
          when(col("event_id") % 13 === 0, concat(lit("x"), col("event_id")))
            .otherwise(col("event_id").cast("string")),
          col("event_type"),
          coalesce(col("user_id").cast("string"), lit("")),
          col("ts_us").cast("string")).as("value"))
          .repartition(fanEvHeavyN(s, dir)),
        feed)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("user_id", LongType), StructField("ts_us", LongType)))
      Sinks.csvPermissiveRead(s, feed, schema)
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
            .repartition(fanEvN(s, dir)), "raw")
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
        .repartition(fanN(s, dir))
      Dedup.incrementalNewDocs(docs, batch).orderBy(col("doc_id"))
    }),

    "q_overlap_matrix" -> ((s0, dir) => {
      val s = ensure(s0)
      Dedup.sourceOverlapMatrix(
          Tables.documents(s, dir)
            .repartition(fanN(s, dir)))
        .orderBy(col("src_a"), col("src_b"))
    }),

    "q_embed_proto" -> ((s0, dir) => {
      val s = ensure(s0)
      Sim.prototypicality(Tables.embeddings(s, dir))
        .orderBy(col("vec_id"))
    }),
  )
}
