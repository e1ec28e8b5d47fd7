package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutation-shaped relational operators: MERGE (upsert-with-update)
  * and slowly-changing-dimension (SCD2) history building.
  *
  * The reference's sink only ever inserts with conflict-skip
  * (`/root/reference/extract_bq.py:216-258` — `ON CONFLICT DO
  * NOTHING`); a production fact/dimension maintenance pipeline also
  * needs the update-matched half of MERGE and the "keep history"
  * SCD2 variant. Both are expressed as pure joins/windows over
  * immutable snapshots so Catalyst plans them like any other
  * relational op — no row-at-a-time mutation, re-runs are
  * deterministic, and the output is a complete next snapshot that a
  * sink can atomically swap in (the overwrite-partition pattern in
  * `etl/Sinks`).
  */
object Mutations {

  /** MERGE over immutable snapshots: every key present in either side
    * lands exactly once in the output; a key present in `updates`
    * takes the update's values — including its NULLs, per `WHEN
    * MATCHED THEN UPDATE SET` semantics — and a key only in `base`
    * keeps its old row. `merge_action` records which branch fired
    * (`update` / `insert` / `keep`), which is what an auditable merge
    * job logs per run.
    *
    * Shape: built as (base LEFT JOIN updates) ∪ (updates ANTI base)
    * rather than one full-outer join. In the canonical case —
    * |updates| ≪ |base| (a day's changes against years of history) —
    * both joins take `updates` as the broadcast side, so the base
    * snapshot is never shuffled at all; a full-outer join would
    * hash-repartition ALL of base on the key. When both sides are
    * large, Catalyst/AQE falls back to sort-merge for both joins and
    * the cost converges to the full-outer form (one extra scan of
    * `updates`, which is the small side by hypothesis).
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"merge sides must share a schema: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val valCols = base.columns.filterNot(keys.contains).toSeq
    val u = updates.select(
      keys.map(col) ++ valCols.map(c => col(c).as(s"__u_$c")) :+ lit(true).as("__in_u"): _*)
    val matchedOrKept = base.join(u, keys, "left").select(
      keys.map(col) ++
        valCols.map(c => when(col("__in_u"), col(s"__u_$c")).otherwise(col(c)).as(c)) :+
        when(col("__in_u"), lit("update")).otherwise(lit("keep")).as("merge_action"): _*)
    val inserted = updates.join(base.select(keys.map(col): _*), keys, "left_anti")
      .select(keys.map(col) ++ valCols.map(col) :+ lit("insert").as("merge_action"): _*)
    matchedOrKept.unionByName(inserted)
  }

  /** SCD2 history build from an attribute-change event stream: per
    * `key`, order by (`tsCol`, `ordCol`), collapse consecutive rows
    * with an unchanged `attr` (only transitions open a new version),
    * then stamp each version with `valid_from` (its first timestamp),
    * `valid_to` (the NEXT version's start, NULL while current),
    * `version` (1-based), and `is_current`. This is the standard
    * "type 2" dimension: point-in-time joins become
    * `fact.ts >= valid_from AND (fact.ts < valid_to OR valid_to IS
    * NULL)` range joins ([[Relational.rangeJoinBinned]]).
    *
    * Shape: two window passes over the SAME (key, ts) partitioning —
    * Catalyst reuses one sort+shuffle for both (lag to detect
    * transitions, then lead/row_number over the filtered survivors).
    * At 100 TB this scales with the number of keys per partition, not
    * history length; no self-join, no driver state.
    */
  def scd2(events: DataFrame, key: String, attr: String,
           tsCol: String, ordCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy(col(key)).orderBy(col(tsCol), col(ordCol))
    val transitions = events
      .select(col(key), col(tsCol), col(ordCol), col(attr))
      .withColumn("__prev", lag(col(attr), 1).over(wAll))
      .filter(col("__prev").isNull || !(col("__prev") <=> col(attr)))
    val wVer = Window.partitionBy(col(key)).orderBy(col(tsCol), col(ordCol))
    transitions
      .withColumn("version", row_number().over(wVer).cast("long"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wVer))
      .select(
        col(key), col("version"), col(attr),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Snapshot diff — the CDC view between two keyed snapshots: every
    * key labeled `added` / `removed` / `changed` / `same` by comparing
    * the given value columns null-safely (`<=>`, so a NULL→NULL column
    * is `same`, NULL→value is `changed`). The audit table a daily
    * dimension rebuild should publish before overwriting.
    *
    * Shape: one full-outer join on the key. Snapshots are typically
    * pre-aggregated (per-key rows), so the join is |keys|-sized; when
    * diffing raw fact snapshots at 100 TB, both sides arrive
    * identically bucketed by key and the join is co-partitioned with
    * zero extra shuffle.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val o = compareCols.foldLeft(oldSnap) { (d, c) => d.withColumnRenamed(c, s"old_$c") }
      .withColumn("__in_old", lit(true))
    val n = compareCols.foldLeft(newSnap) { (d, c) => d.withColumnRenamed(c, s"new_$c") }
      .withColumn("__in_new", lit(true))
    val unchanged = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(unchanged, "same")
          .otherwise("changed"))
      .drop("__in_old", "__in_new")
  }

  /** CDC changelog application: fold a stream of keyed change events
    * (op ∈ I/U/D with a monotident sequence column) into a base
    * snapshot — the Debezium-consumer / "table from a binlog"
    * operator. Last writer wins per key (max seq; ties break to the
    * delete so a same-sequence I+D converges to absent — the safe
    * direction); a winning D removes the key, a winning I/U upserts
    * its value, untouched base keys pass through.
    *
    * Shape: the changelog collapses to one row per key FIRST (max_by
    * struct aggregate — map-side combinable, |changed keys| rows),
    * then ONE outer join against the base; the base never shuffles
    * more than that join, and when changes are small the folded side
    * broadcasts. This is [[mergeUpsert]] plus delete semantics and
    * explicit ordering — the piece a binlog needs that MERGE lacks.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, key: String,
                     seqCol: String): DataFrame = {
    val valCols = base.columns.filterNot(_ == key).toSeq
    val winner = changes
      .groupBy(col(key))
      .agg(max_by(
        struct((col("op") === "D").as("del"), struct(valCols.map(col): _*).as("v")),
        // seq ties: delete outranks insert/update — fold the op into
        // the ordering key's low bit
        struct(col(seqCol), (col("op") === "D").cast("int").as("d"))).as("w"))
      .select(col(key), col("w.del").as("__del"), col("w.v").as("__v"))
    base.join(winner, Seq(key), "full_outer")
      .filter(col("__del").isNull || !col("__del"))
      .select(
        col(key) +:
          valCols.map(c =>
            when(col("__del").isNotNull, col(s"__v.$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Point-in-time (AS OF) lookup of a type-2 dimension: each fact row
    * joins the dimension VERSION whose validity interval contains the
    * fact's timestamp — the join that makes historical reports
    * reproducible (re-running last quarter's report uses last
    * quarter's attribute values, not today's). `dim` is [[scd2]]
    * output; because scd2 tiles each key's timeline into
    * non-overlapping [valid_from, valid_to) intervals, "containing
    * interval" ≡ "latest version with valid_from ≤ fact ts", so the
    * lookup is EXACTLY the backward as-of join — one tagged union +
    * one window pass ([[Relational.asofJoin]]'s shape), never the
    * facts×versions interval expansion. Facts before the key's first
    * version emit NULL attr/version (no silent row loss).
    *
    * Scale: one shuffle of facts ∪ versions on the key; at 100 TB
    * pre-bucket both sides on the key and the union sorts within
    * buckets. This is the query SCD2 exists to serve — the build
    * (q_scd2) writes the intervals, this reads them.
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      tsCol: String, attr: String): DataFrame = {
    val versions = dim.select(
      col(key), col("valid_from").as(tsCol), col("version"), col(attr))
    Relational.asofJoin(facts, versions, key, tsCol, "version",
        Seq("version", attr))
      .select(facts.columns.map(col) :+
        col("asof.version").as("dim_version") :+
        col(s"asof.$attr").as(s"dim_$attr"): _*)
  }
}
