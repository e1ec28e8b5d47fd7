package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md §7.5 —
  * the LLM-training-data-pipeline extension surface). All built-ins,
  * all shuffle-once aggregations.
  */
object Text {

  /** Exact content dedup: group by content, keep the smallest doc_id
    * (first-write-wins, same keep-rule as the event natural-key dedup).
    *
    * Scale path (100 TB): never shuffle the full text — group by
    * `xxhash64(text)` so the shuffle carries 8 bytes/row, then resolve
    * the (astronomically unlikely) hash collisions with one confirm
    * pass. Here we group by the text itself because the DuckDB oracle
    * has no xxhash64; [[exactDedupByHash]] below is the scale form.
    */
  def exactDedup(documents: DataFrame): DataFrame =
    documents.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Scale form of exact dedup: 8-byte hash shuffle instead of full
    * text. Used by the bench/entry paths; not oracle-checked (DuckDB
    * lacks xxhash64).
    */
  def exactDedupByHash(documents: DataFrame): DataFrame =
    documents.withColumn("h", xxhash64(col("text")))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Token frequencies: split → explode (Generator) → count. The
    * explode is map-side; the single shuffle is on the token.
    */
  def tokenFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Per-(lang, source) corpus stats — length distribution summary. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** F5 capability — string scalar functions over documents. */
  def stringKitchenSink(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      upper(col("lang")).as("lang_u"),
      concat_ws("-", col("lang"), col("source")).as("tag"),
      length(col("text")).cast("long").as("n_len"),
      substring(col("text"), 1, 20).as("prefix"))
}
