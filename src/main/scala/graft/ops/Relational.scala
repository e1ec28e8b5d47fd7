package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capability-closure relational operators over the star schema
  * (SURVEY.md §2.6-2.8). The reference's pipeline is single-table, but
  * its sink exists to serve exactly these shapes (secondary indexes on
  * user/date/name, `/root/reference/extract_bq.py:206-209`), so they are
  * part of the declared engine contract.
  *
  * Scale rules applied throughout: dimension tables (customer, part —
  * O(100k) rows even at SF100) are explicitly `broadcast()` so the fact
  * side never shuffles for the join; window functions partition on
  * high-cardinality keys so the one unavoidable shuffle is well spread.
  */
object Relational {

  /** Inner equi-join fact→dim. Broadcast-hash: no shuffle of `orders`. */
  def ordersWithCustomer(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"), "inner")

  /** Left outer join fact→dim, broadcast. */
  def lineitemWithPart(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"), "left")

  /** Left-semi "customers having orders". The probe side keys are
    * distinct-ed then broadcast, so the big `orders` table is reduced
    * map-side before any join — at 100 TB this is the difference
    * between a broadcast and a full sort-merge shuffle.
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
      broadcast(orders.select("o_custkey").distinct()),
      col("c_custkey") === col("o_custkey"), "left_semi")

  /** row_number per user ordered by time — "nth event per user". */
  def rankPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc, col("event_id").asc)
    events.select(
      col("user_id"), col("event_id"),
      row_number().over(w).cast("long").as("rn"))
  }

  /** lag per user — inter-event gap in micros. */
  def interEventGap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc, col("event_id").asc)
    events.select(
      col("user_id"), col("event_id"), col("ts_us"),
      (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
  }

  /** Tumbling 1-hour wall-clock window × event_type counts — the
    * canonical events-table aggregation (maps to Structured Streaming's
    * `window()` unchanged; epoch-aligned so the window start equals
    * hour truncation).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts_ts", timestamp_micros(col("ts_us")))
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"))

  /** Rollup over (event_type, event_date): per-type-per-day, per-type,
    * grand total — one pass, partial aggregation map-side.
    */
  def rollupTypeDate(events: DataFrame): DataFrame =
    events
      .withColumn("event_date", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd"))
      .rollup(col("event_type"), col("event_date"))
      .agg(count(lit(1)).as("n"))

  /** Skew-safe equi-join for when the build side is too big to
    * broadcast AND the probe side has hot keys: each probe row gets a
    * uniform salt in [0, salt), the build side is replicated once per
    * salt value, and the join key becomes (key, salt) — a hot key's
    * rows now spread over `salt` reducers instead of one straggler.
    *
    * Spark's AQE skew-join handles the common case automatically
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default); this
    * explicit form is for deterministic plans, pre-AQE engines, or
    * skew that AQE's split heuristics miss. The salt assignment is
    * row-arbitrary on the probe side — join OUTPUT is identical to the
    * unsalted join regardless of assignment (pinned by spec).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                 buildKey: String, salt: Int): DataFrame = {
    val saltedProbe = probe.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedBuild = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe
      .join(saltedBuild,
        saltedProbe(probeKey) === saltedBuild(buildKey) &&
          saltedProbe("__salt") === saltedBuild("__salt"))
      .drop("__salt")
  }

  /** Distinct-user counts per event type. Exact count-distinct shuffles
    * (user_id, event_type) once; at 100 TB prefer
    * `approx_count_distinct` (HLL, no second shuffle) when ±2% is
    * acceptable — kept exact here because the oracle hash-compares.
    */
  def distinctUsersPerType(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** The 100 TB form of [[distinctUsersPerType]]: HyperLogLog++ sketch
    * (`approx_count_distinct`) — one shuffle of fixed-size sketches
    * instead of a second expand-shuffle on (group, user), at a bounded
    * relative error (`rsd`, default 5%). Not oracle-checked (sketch
    * internals differ across engines); the spec pins the error bound
    * against the exact count.
    */
  def approxDistinctUsersPerType(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))
}
