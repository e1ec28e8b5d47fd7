package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.ops.EventOps

/** Sink protocols (SURVEY.md §2.1 S4-S6). Parquet/CSV directories stand
  * in for the reference's Postgres table; the upsert protocol is the
  * anti-join-then-append form of `INSERT ... ON CONFLICT DO NOTHING`
  * (`/root/reference/extract_bq.py:220`) — correct under single-writer,
  * which the incremental orchestrator guarantees (the reference's
  * single-flight guard, `/root/reference/flask_server.py:86-90`).
  */
object Sinks {

  /** S4 — CSV export (`/root/reference/extract_bq.py:142-185`): write
    * with header, then re-read with an explicit schema (never inferred —
    * the reference's schemas are always fixed). Returns the re-read
    * frame so round-trip fidelity is checkable.
    */
  def csvRoundTrip(df: DataFrame, dir: String, schema: StructType): DataFrame = {
    df.write.mode("overwrite").option("header", "true").csv(dir)
    df.sparkSession.read.schema(schema).option("header", "true").csv(dir)
  }

  /** ORC round trip, same contract as [[csvRoundTrip]]: columnar
    * alternative to parquet (same pushdown/pruning machinery in Spark,
    * different footer/stripe layout), re-read with the explicit schema.
    */
  def orcRoundTrip(df: DataFrame, dir: String, schema: StructType): DataFrame = {
    df.write.mode("overwrite").orc(dir)
    df.sparkSession.read.schema(schema).orc(dir)
  }

  /** JSON-lines round trip, same contract as [[csvRoundTrip]]: write
    * newline-delimited JSON, re-read with the explicit schema (never
    * inferred). Doubles survive exactly — the writer emits the
    * shortest representation that parses back to the same IEEE double.
    */
  def jsonRoundTrip(df: DataFrame, dir: String, schema: StructType): DataFrame = {
    df.write.mode("overwrite").json(dir)
    df.sparkSession.read.schema(schema).json(dir)
  }

  /** PERMISSIVE JSON intake with corrupt-record routing — the
    * real-world dirty-feed contract: malformed LINES (vs q_safe_cast's
    * malformed CELLS) land in a `_corrupt_record` column instead of
    * killing the read; good rows parse normally. The caller gets one
    * frame with both, to count/route/quarantine.
    *
    * The cache is REQUIRED, not an optimization: Spark refuses queries
    * that reference only the internal corrupt-record column of an
    * unmaterialized JSON scan (SPARK-21610) — persisting first is the
    * documented pattern.
    */
  def jsonPermissiveRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                         schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    graft.CacheScope.cached(
      spark.read.schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir))
  }

  /** XML round trip, same contract as [[csvRoundTrip]]: Spark 4 ships
    * the (donated) spark-xml datasource natively, so XML is a
    * first-class format surface beside CSV/JSON/ORC. Written with an
    * explicit rowTag, re-read with the explicit schema (never
    * inferred). The writer XML-escapes markup characters in string
    * values and omits elements for nulls; the reader reverses both, so
    * the trip is lossless for the scalar types used here.
    */
  def xmlRoundTrip(df: DataFrame, dir: String, schema: StructType,
                   rowTag: String = "row"): DataFrame = {
    df.write.mode("overwrite").option("rowTag", rowTag).format("xml").save(dir)
    df.sparkSession.read.schema(schema).option("rowTag", rowTag)
      .format("xml").load(dir)
  }

  /** PERMISSIVE XML intake with corrupt-record routing — the
    * [[jsonPermissiveRead]] contract for the XML surface. The feed
    * contract here is LINE-DELIMITED row elements (`multiLine=false`,
    * one `<row>…</row>` per line): that is what keeps quarantine
    * granularity at ONE ROW — the default whole-document parse dumps
    * the entire remaining split into `_corrupt_record` at the first
    * failure (and at 100 TB a line-delimited feed is also what makes
    * the scan splittable at all, exactly like JSONL vs multi-line
    * JSON). Malformed VALUES (a non-numeric long cell) route that row
    * to `_corrupt_record`; well-formed neighbors are untouched —
    * spec-pinned in SinksSpec.
    *
    * Cached for the same reason as the JSON twin: queries that touch
    * only the corrupt-record column of an unmaterialized scan are
    * rejected (SPARK-21610); persisting first is the documented
    * pattern.
    */
  def xmlPermissiveRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                        schema: StructType, rowTag: String = "row"): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    graft.CacheScope.cached(
      spark.read.schema(withCorrupt)
        .option("rowTag", rowTag)
        .option("multiLine", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .format("xml").load(dir))
  }

  /** PERMISSIVE CSV intake with corrupt-record routing — the
    * [[jsonPermissiveRead]] contract for the CSV surface, completing
    * the dirty-feed trio (JSONL / line-delimited XML / CSV). A row
    * with a cell that fails its schema type (a non-numeric long)
    * routes to `_corrupt_record`; well-formed neighbors parse
    * normally. CSV is line-delimited by nature, so the scan splits at
    * 100 TB exactly like the JSONL feed.
    *
    * Cached for the same reason as the JSON twin: queries that touch
    * only the corrupt-record column of an unmaterialized scan are
    * rejected (SPARK-21610); persisting first is the documented
    * pattern.
    */
  def csvPermissiveRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                        schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    graft.CacheScope.cached(
      spark.read.schema(withCorrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir))
  }

  /** S5 — batched append: Spark writes one file per partition per
    * batch; append mode accumulates (the `execute_batch` analogue,
    * `/root/reference/extract_bq.py:247-252`).
    */
  def append(df: DataFrame, dir: String): Unit =
    df.write.mode("append").parquet(dir)

  def overwrite(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Materialize `df` partitioned by `partitionCol` (hive-style
    * directory layout) if not already present — the engine-side
    * analogue of the reference's date-sharded `events_YYYYMMDD` table
    * family (`/root/reference/extract_bq.py:95-110`): one directory per
    * day, so a date predicate prunes whole directories at planning
    * time instead of reading and filtering.
    */
  def ensurePartitioned(df: DataFrame, dir: String, partitionCol: String): Unit =
    lockFor(dir).synchronized {
      val marker = new java.io.File(dir, "_SUCCESS")
      if (!marker.exists()) {
        df.write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
        graft.Tables.invalidatePath(dir) // a rebuilt path must not serve a stale memoized relation
      }
    }

  /** Write-once materialization: write `df` to `dir` unless a previous
    * run already completed there (the _SUCCESS marker). `df` is
    * by-name so the frame isn't even planned on the hit path.
    */
  /** In-JVM guard for the check-then-write below: the bench's 8-way
    * throughput phase can race two lazily-ensured consumers of the
    * same fixture path in ONE JVM (e.g. after a failed prepare());
    * without a lock both see no marker and overwrite each other's
    * in-flight files. PER-DIRECTORY locks (not one global monitor): an
    * in-flight write of one fixture must not stall every unrelated
    * fixture's marker check during the throughput phase — only writers
    * of the SAME path serialize. Writers in separate JVMs still need
    * external coordination — these fixtures are per-session scratch,
    * so the JVM-wide scope is the honest one.
    */
  private val ensureLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]
  private def lockFor(dir: String): Object =
    ensureLocks.computeIfAbsent(dir, _ => new Object)

  def ensureWritten(df: => DataFrame, dir: String): Unit = lockFor(dir).synchronized {
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) {
      df.write.mode("overwrite").parquet(dir)
      graft.Tables.invalidatePath(dir) // see ensurePartitioned
    }
  }

  /** [[ensureWritten]] for raw text lines (a single `value` column). */
  def ensureTextWritten(df: => DataFrame, dir: String): Unit = lockFor(dir).synchronized {
    val marker = new java.io.File(dir, "_SUCCESS")
    if (!marker.exists()) {
      df.write.mode("overwrite").text(dir)
      graft.Tables.invalidatePath(dir) // see ensurePartitioned
    }
  }

  /** Small-file compaction: rewrite a directory into `numFiles`
    * right-sized parquet files. Long-running append pipelines (the
    * incremental upsert sink) accumulate one file per batch per
    * partition; at scale the fix is a periodic compaction pass sized
    * so each file is ~128MB-1GB. Writes to a temp dir then swaps, so a
    * crash mid-compact never loses the sink.
    */
  def compact(spark: SparkSession, dir: String, numFiles: Int): Unit = {
    import java.nio.file.{Files, Paths}
    val tmp = dir + ".compacting"
    spark.read.parquet(dir).repartition(numFiles)
      .write.mode("overwrite").parquet(tmp)
    val target = Paths.get(dir)
    val backup = Paths.get(dir + ".old")
    if (Files.exists(backup)) delete(backup.toFile)
    // Files.move throws on failure (unlike File.renameTo, which returns
    // false and would let a failed swap fall through to the backup
    // delete below — losing the only copy of the sink).
    Files.move(target, backup)
    try Files.move(Paths.get(tmp), target)
    catch { case e: Throwable =>
      Files.move(backup, target) // roll back: restore the original sink
      throw e
    }
    // Only drop the backup once the swapped-in sink is really there.
    if (!Files.isDirectory(target) || !Files.exists(target.resolve("_SUCCESS")))
      throw new IllegalStateException(
        s"compact: swapped target $dir is missing or incomplete; backup kept at $backup")
    delete(backup.toFile)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }

  /** Conflict-skip insert statement for a SQL dialect: the statement
    * text plus the row fields to bind, in bind order.
    */
  final case class UpsertDialect(sql: String, bindCols: Seq[String])

  /** The reference's exact statement (`/root/reference/extract_bq.py:216-258`):
    * Postgres `INSERT ... ON CONFLICT (keys) DO NOTHING`. One bind per
    * column; the conflict check is atomic in the engine.
    */
  def postgresOnConflictDialect(table: String, cols: Seq[String], keys: Seq[String]): UpsertDialect =
    UpsertDialect(
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |VALUES (${cols.map(_ => "?").mkString(", ")})
         |ON CONFLICT (${keys.mkString(", ")}) DO NOTHING""".stripMargin,
      cols)

  /** Insert-if-absent for engines without ON CONFLICT (Derby, the
    * embedded database this harness CAN run): binds every column, then
    * the key columns again for the NOT EXISTS probe. Safe when each
    * natural key is written by one partition (see [[jdbcUpsert]]).
    */
  def insertWhereAbsentDialect(table: String, cols: Seq[String], keys: Seq[String]): UpsertDialect =
    UpsertDialect(
      s"""INSERT INTO $table (${cols.mkString(", ")})
         |SELECT ${cols.map(_ => "?").mkString(", ")} FROM SYSIBM.SYSDUMMY1
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM $table WHERE ${keys.map(k => s"$k = ?").mkString(" AND ")})""".stripMargin,
      cols ++ keys)

  /** Real-database upsert (SURVEY §7.4): per-partition batched
    * conflict-skip insert — the reference's `execute_batch(page_size=1000)`
    * loop (`/root/reference/extract_bq.py:247-252`) becomes N parallel
    * writers, one connection per partition. `commitPerBatch = true`
    * mirrors extract_bq's commit-every-page; `false` mirrors
    * flask_server.py:196's single commit per partition.
    *
    * Returns the number of rows actually inserted (the reference's
    * `cursor.rowcount` accounting), summed across partitions via a
    * LongAccumulator — no collect.
    *
    * Correctness under parallel writers: `repartitionByKeys` (default
    * on) hash-partitions the frame on the natural key first, so all
    * rows for one key are written by one partition and a NOT-EXISTS
    * dialect cannot race against a sibling writer. With an atomic
    * dialect (Postgres ON CONFLICT) the pre-shuffle is optional but
    * still the right 100 TB shape — it also dedupes writer/lock
    * contention per key range. Exercised end-to-end against embedded
    * Derby in JdbcUpsertSpec.
    */
  def jdbcUpsert(
      df: DataFrame, url: String, table: String, keys: Seq[String],
      dialect: (String, Seq[String], Seq[String]) => UpsertDialect,
      batchSize: Int = 1000,
      commitPerBatch: Boolean = true,
      repartitionByKeys: Boolean = true): Long = {
    val cols = df.schema.fieldNames.toSeq
    val d = dialect(table, cols, keys)
    val bindIdx = d.bindCols.map(c => cols.indexOf(c)).toArray
    require(bindIdx.forall(_ >= 0), s"dialect binds unknown column in ${d.bindCols}")
    val inserted = df.sparkSession.sparkContext.longAccumulator("jdbc_upsert_inserted")
    val part = if (repartitionByKeys) df.repartition(keys.map(df(_)): _*) else df
    part.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(d.sql)
          rows.grouped(batchSize).foreach { batch =>
            batch.foreach { r =>
              var i = 0
              while (i < bindIdx.length) {
                ps.setObject(i + 1, r.get(bindIdx(i))); i += 1
              }
              ps.addBatch()
            }
            inserted.add(ps.executeBatch().map(_.toLong.max(0L)).sum)
            if (commitPerBatch) conn.commit()
          }
          if (!commitPerBatch) conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
    inserted.value
  }

  /** Warehouse-scale Postgres load — the form the reference's
    * row-batched `execute_batch(INSERT ... ON CONFLICT)` loop
    * (`/root/reference/extract_bq.py:247-252`) takes at 100 TB: each
    * partition streams CSV through `COPY ... FROM STDIN` into an
    * UNLOGGED staging table (PostgreSQL's bulk fast path — no WAL, no
    * per-row round trip, concurrent COPY writers are safe), then ONE
    * set-based `INSERT ... SELECT ... ON CONFLICT (keys) DO NOTHING`
    * moves staging into the target atomically and reports the inserted
    * count (the reference's `cursor.rowcount` accounting, exactly).
    *
    * Transport is the `psql` CLI pipe (this sandbox ships a real
    * PostgreSQL 15 but no pgJDBC jar); production swaps the pipe for
    * the JDBC `CopyManager` — the byte stream and the SQL are
    * identical. Returns rows inserted into the TARGET (conflicts
    * skipped), like [[jdbcUpsert]].
    *
    * CSV contract: every non-null field is quoted (embedded quotes
    * doubled), nulls are unquoted empty (COPY csv's NULL spelling) —
    * lossless for arbitrary strings including delimiters/newlines.
    */
  def copyUpsertPostgres(df: DataFrame, psqlArgs: Seq[String], table: String,
                         keys: Seq[String]): Long = {
    import scala.sys.process._
    val cols = df.schema.fieldNames.toSeq
    val colList = cols.mkString(", ")
    // Unique per-call staging name: a fixed `${table}_stage` would let
    // two concurrent loads into the same target (a streaming drain plus
    // an ad-hoc batch) DROP/clobber each other's staging mid-COPY and
    // silently lose rows. Callers here are serialized (Incremental's
    // CAS guard, AvailableNow triggers), but the sink must not depend
    // on that.
    val staging = s"${table}_stg_${java.util.UUID.randomUUID().toString.take(13).replace("-", "")}"
    // PostgreSQL truncates identifiers to 63 bytes with only a NOTICE —
    // a long target name would silently truncate the unique suffix away
    // and re-open the concurrent-clobber hole. Fail loudly instead.
    require(staging.getBytes("UTF-8").length <= 63,
      s"copyUpsertPostgres: staging identifier '$staging' exceeds PostgreSQL's " +
        "63-byte limit — use a shorter target table name")
    def psql(sql: String): String =
      (Seq("psql") ++ psqlArgs ++
        Seq("-X", "-t", "-A", "-v", "ON_ERROR_STOP=1", "-c", sql)).!!.trim
    psql(s"DROP TABLE IF EXISTS $staging")
    psql(s"CREATE UNLOGGED TABLE $staging (LIKE $table INCLUDING DEFAULTS)")
    try {
      val argsSer = psqlArgs // serializable capture for the task closure
      df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val cmd = Seq("psql") ++ argsSer ++ Seq("-X", "-v", "ON_ERROR_STOP=1",
            "-c", s"COPY $staging ($colList) FROM STDIN WITH (FORMAT csv)")
          val pb = new java.lang.ProcessBuilder(cmd: _*)
            .redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
            .redirectError(java.lang.ProcessBuilder.Redirect.INHERIT)
          val proc = pb.start()
          val out = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          // Whitelisted types only: primitives/temporals render to
          // PG-parseable unambiguous text; anything else (binary's
          // '[B@...', WrappedArray, struct Rows) would silently corrupt
          // the COPY stream — fail loudly instead.
          def field(v: Any): String = v match {
            case null => ""
            case s: String => "\"" + s.replace("\"", "\"\"") + "\""
            case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
                 _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
                 _: java.lang.Boolean | _: java.math.BigDecimal |
                 _: java.sql.Timestamp | _: java.sql.Date |
                 _: java.time.Instant | _: java.time.LocalDate |
                 _: java.time.LocalDateTime => v.toString
            case other => sys.error(
              s"copyUpsertPostgres: unsupported field type ${other.getClass.getName}" +
                " — cast to a primitive/temporal/string column before the sink")
          }
          rows.foreach { r =>
            out.write((0 until r.length).map(i => field(r.get(i))).mkString(","))
            out.write("\n")
          }
          out.close()
          val rc = proc.waitFor()
          require(rc == 0, s"COPY writer exited $rc")
        }
      }
      val res = psql(
        s"""INSERT INTO $table ($colList)
           |SELECT $colList FROM $staging
           |ON CONFLICT (${keys.mkString(", ")}) DO NOTHING""".stripMargin)
      // psql prints the command tag "INSERT 0 <n>" even under -t -A —
      // the reference's cursor.rowcount, read from the same place
      "INSERT\\s+\\d+\\s+(\\d+)".r.findFirstMatchIn(res)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"unexpected INSERT tag: '$res'"))
    } finally psql(s"DROP TABLE IF EXISTS $staging")
  }

  /** S6 — idempotent upsert: append only rows whose natural key is not
    * already in the sink. Returns the number of rows appended (the
    * reference's `cursor.rowcount`, `/root/reference/flask_server.py:197`).
    */
  def upsertAppend(spark: SparkSession, incoming: DataFrame, dir: String, keys: Seq[String]): Long = {
    val exists = new java.io.File(dir).exists()
    val fresh =
      if (!exists) incoming
      else EventOps.newKeysOnly(incoming, spark.read.parquet(dir), keys)
    // Materialize the anti-join BEFORE appending: appending while the
    // lazy plan still scans the sink dir would race with itself.
    val staged = fresh.cache()
    val n = staged.count()
    if (n > 0) staged.write.mode("append").parquet(dir)
    staged.unpersist()
    n
  }

  /** Z-order (Morton-curve) layout write: cluster rows so each output
    * file covers a small rectangle of the (c1, c2) value space instead
    * of a random slice of it. Parquet footers carry per-file/row-group
    * min/max for every column, and scans skip files whose range misses
    * the predicate — but that only bites when the layout makes ranges
    * NARROW. Sorting by one column leaves the other's per-file range at
    * ~100%; interleaving the bits of both ranks ("Databricks-style"
    * OPTIMIZE ZORDER, Delta Lake's data-skipping design; the curve is
    * Morton 1966) bounds BOTH, so a 2-d box predicate prunes ~O(√files)
    * instead of none.
    *
    * Normalization here is linear min/max → 16-bit grid (right for the
    * near-uniform synthetic keys; for skewed production data substitute
    * approxQuantile cut points — same broadcast-scalar shape as the
    * IVF centroid build). The min/max agg is one tiny job.
    *
    * File assignment is EQUAL-WIDTH bucketing of the 32-bit curve
    * (`bucket = z·nFiles >> 32`): each file owns one contiguous curve
    * segment — the same contiguity `repartitionByRange` would give,
    * WITHOUT the range partitioner's full sampling pass, so a
    * z-ordered write at 100 TB scans its input once, not twice. The
    * equal-width cut is safe because the grid coords are min/max
    * normalized (near-uniform on the curve); skewed data would swap in
    * quantile cut points at the same line. Buckets ride an ordinary
    * hash repartition (UnsafeRow shuffle — no RDD round-trip, no row
    * serialization) through a ROUTING TABLE: for each bucket we pick,
    * with the engine's own Murmur3Hash, a carrier value that lands in
    * a distinct partition — a driver-side search over a few dozen
    * integers — so the n buckets map 1:1 onto the n output files.
    */
  def zorderedWrite(df: DataFrame, c1: String, c2: String, dir: String,
                    nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val b = df.agg(
      min(col(c1)).cast("double").as("lo1"), max(col(c1)).cast("double").as("hi1"),
      min(col(c2)).cast("double").as("lo2"), max(col(c2)).cast("double").as("hi2"))
    def grid(x: Column, lo: Column, hi: Column): Column =
      least(lit(65535),
        floor((x.cast("double") - lo) / (hi - lo + lit(1e-12)) * 65536).cast("long"))
    def interleave(g1: Column, g2: Column): Column =
      (0 until 16).map { i =>
        shiftleft(shiftright(g1, i).bitwiseAND(1), 2 * i)
          .bitwiseOR(shiftleft(shiftright(g2, i).bitwiseAND(1), 2 * i + 1))
      }.reduce(_.bitwiseOR(_))
    // bucket b -> a long whose Murmur3 hash (the exact expression
    // repartition uses, evaluated here on the driver) pmods to a
    // partition no other bucket routes to
    val route: Seq[Long] = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
      val byPartition = scala.collection.mutable.Map[Int, Long]()
      var v = 0L
      while (byPartition.size < nFiles) {
        val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
        val p = ((h % nFiles) + nFiles) % nFiles
        if (!byPartition.contains(p)) byPartition(p) = v
        v += 1
      }
      (0 until nFiles).map(byPartition)
    }
    df.crossJoin(broadcast(b))
      .withColumn("__z", interleave(
        grid(col(c1), col("lo1"), col("hi1")),
        grid(col(c2), col("lo2"), col("hi2"))))
      .withColumn("__route", element_at(
        array(route.map(lit(_)): _*),
        (shiftrightunsigned(col("__z") * nFiles, 32) + 1).cast("int")))
      .repartition(nFiles, col("__route"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__route", "lo1", "hi1", "lo2", "hi2")
      .write.mode("overwrite").parquet(dir)
  }
}
