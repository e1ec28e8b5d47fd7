package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §7.5).
  *
  * The dot product / norm are pure built-in higher-order functions
  * (`zip_with` + `aggregate`) over `array<double>` — sequential left
  * fold in array-index order, so the double arithmetic is
  * deterministic and matches any engine that folds in order.
  */
object Sim {

  /** Left-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: for each of a SMALL query set (queries
    * broadcast), score against all candidates, keep top `k` per query.
    *
    * Shape at scale: the query side is broadcast, so the candidate
    * table streams through map-side only — no shuffle of the 100 TB
    * side for scoring; the only shuffle is the tiny
    * (n_queries × n_candidates→k) top-k window. Ranking is done on the
    * ROUNDED score with doc-id tiebreak so results are reproducible
    * across engines and runs.
    *
    * 100 TB path (documented, not needed at test SF): pre-bucket
    * candidates with LSH (random hyperplane signatures, `hash` on sign
    * bits) or IVF (k-means coarse centroids), then score only the
    * buckets the query hashes into — turns O(Q×N) into O(Q×N/buckets).
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val asDouble = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cands = asDouble.select(
      col("vec_id").as("c_id"), col("v").as("cv"), norm(col("v")).as("cn"))
    val queries = asDouble.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), norm(col("v")).as("qn"))
    val scored = cands
      .join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(
        col("q_id"), col("c_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4).as("cos_r"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("c_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
