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

  /** Left-fold dot product of two array<double> columns — the pure
    * built-in formulation. HOF lambdas are interpreted, so prefer
    * [[dotNative]] in hot paths when the session has GraftExtensions.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Codegen'd dot product via the native graft_dot expression
    * (graft.plans.DotProduct) when registered, else the HOF fallback.
    * Identical results on equal-length dense vectors, so oracle
    * comparisons are unaffected by which path runs.
    */
  def dotNative(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_dot")) call_function("graft_dot", a, b)
    else dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize an array<double> embedding (unit length; zero vector
    * stays zero). After this, dot product IS cosine — normalize once
    * at ingest, save a sqrt per comparison forever.
    */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Symmetric int8 quantization: scale by 127/maxAbs and round —
    * 4× smaller embeddings for ANN shortlisting; rescore survivors at
    * full precision. Returns struct(scale, q) so dequantization is
    * self-contained.
    */
  def quantizeInt8(a: Column): Column = {
    val maxAbs = aggregate(a, lit(0.0d), (acc, x) => greatest(acc, abs(x)))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    struct(
      scale.as("scale"),
      transform(a, x => round(x / scale).cast("byte")).as("q"))
  }

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
    val dotF = dotNative(embeddings.sparkSession) _
    def normF(c: Column) = sqrt(dotF(c, c))
    val asDouble = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cands = asDouble.select(
      col("vec_id").as("c_id"), col("v").as("cv"), normF(col("v")).as("cn"))
    val queries = asDouble.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), normF(col("v")).as("qn"))
    val scored = cands
      .join(broadcast(queries), col("q_id") =!= col("c_id"))
      .select(
        col("q_id"), col("c_id"),
        round(dotF(col("qv"), col("cv")) / (col("qn") * col("cn")), 4).as("cos_r"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("c_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Random-hyperplane LSH (Charikar, STOC 2002): signature bit i =
    * sign(v · r_i) for `nPlanes` fixed pseudo-random hyperplanes.
    * P[bit agrees] = 1 − θ/π, so high-cosine vectors collide into the
    * same bucket with high probability and the all-pairs search
    * becomes per-bucket. Planes are generated from a fixed seed, so
    * bucketing is deterministic across runs and executors. Identical
    * vectors always share a bucket; recall for near-but-not-identical
    * pairs is tuned by nPlanes (fewer planes = bigger buckets = higher
    * recall, more work) and, in production, multi-probe (flip the
    * lowest-margin bits and search those buckets too).
    */
  def hyperplaneLshBuckets(embeddings: DataFrame, dim: Int, nPlanes: Int, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
    val v = col("embedding").cast("array<double>")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedlit(p)) > 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    embeddings.select(col("vec_id"), v.as("v"), bucket.as("bucket"))
  }

  /** LSH-bucketed approximate top-k: score a query only against
    * candidates sharing its hyperplane-LSH bucket. Same shape as
    * [[cosineTopKIvf]] but the partitioner is data-independent (no
    * centroid build step) — the right choice when the corpus drifts
    * faster than you want to re-train centroids. Production recall
    * comes from multi-probe (also search buckets at hamming distance 1
    * from the query's signature).
    */
  def cosineTopKLsh(embeddings: DataFrame, nQueries: Int, k: Int, nPlanes: Int): DataFrame = {
    val dotF = dotNative(embeddings.sparkSession) _
    val bucketed = hyperplaneLshBuckets(embeddings, dim = 64, nPlanes = nPlanes)
      .withColumn("nrm", sqrt(dotF(col("v"), col("v"))))
      .cache()
    val queries = bucketed.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val scored = bucketed
      .join(broadcast(queries), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("c_id"),
        round(dotF(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("cos_r"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("c_id").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** IVF (inverted-file) approximate nearest neighbour — the coarse
    * quantizer of Jégou/Douze/Schmid's IVF-PQ family ("Product
    * quantization for nearest neighbor search", TPAMI 2011) without
    * the PQ residual codes — and the 100 TB scale path for
    * [[cosineTopK]]:
    *
    *  1. pick `nCells` coarse centroids (here: the first `nCells`
    *     vectors, deterministically; a real build k-means them);
    *  2. assign every vector to its best centroid by cosine — a
    *     broadcast of nCells tiny vectors, MAP-SIDE, no shuffle of the
    *     big table;
    *  3. answer a query by scoring ONLY its own cell — N/nCells of the
    *     corpus instead of N.
    *
    * Assignment uses the score rounded to 6dp with centroid-id
    * tiebreak so cell boundaries are reproducible across engines.
    */
  def cosineTopKIvf(embeddings: DataFrame, nQueries: Int, k: Int, nCells: Int): DataFrame = {
    val dotF = dotNative(embeddings.sparkSession) _
    def normF(c: Column) = sqrt(dotF(c, c))
    val asDouble = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withNorm = asDouble.withColumn("nrm", normF(col("v")))
    val centroids = withNorm.filter(col("vec_id") < nCells).select(
      col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("cent_id").asc)
    val assigned = withNorm
      .join(broadcast(centroids))
      .withColumn("score",
        round(dotF(col("v"), col("cv")) / (col("nrm") * col("cn")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cent_id").as("cell"))
      // read twice (query set + candidate set); cache beats re-running
      // the centroid assignment
      .cache()
    val queries = assigned.filter(col("vec_id") < nQueries).select(
      col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("cell"))
    val scored = assigned
      .join(broadcast(queries), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(
        col("q_id"), col("vec_id").as("c_id"),
        round(dotF(col("qv"), col("v")) / (col("qn") * col("nrm")), 4).as("cos_r"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("c_id").asc)
    scored
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
  }
}
