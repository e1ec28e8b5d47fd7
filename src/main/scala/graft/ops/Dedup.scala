package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over text corpora — the document-dedup
  * toolbox of a training-data pipeline: exact (see [[Text.exactDedup]]),
  * n-gram Jaccard (exact pairwise), MinHash+LSH (approximate, scalable),
  * and SimHash clustering.
  *
  * Algorithms are the published classics: MinHash resemblance sketches
  * (Broder, "On the resemblance and containment of documents", 1997),
  * LSH band-bucketing (Indyk & Motwani 1998; the banding analysis in
  * Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3), and
  * SimHash fingerprints (Charikar, "Similarity estimation techniques
  * from rounding algorithms", STOC 2002; used at crawl scale in Manku
  * et al., WWW 2007). See also PAPERS.md for the retrieved top-k
  * similarity literature.
  *
  * Hash choice: md5 of the UTF-8 shingle/token — slower than xxhash64
  * but bit-identical in every engine (the DuckDB oracle reproduces it),
  * which makes the whole pipeline correctness-checkable end to end. At
  * 100 TB replace the `md5(...)`-prefix expressions with `xxhash64` —
  * one line per site, same structure.
  */
object Dedup {

  /** Whitespace tokens, empties dropped. Map-side HOF, no explode. */
  def tokens(text: Column): Column = filter(split(text, " "), t => t =!= "")

  /** (doc_id, shingle) pairs: distinct 3-gram token shingles, one row
    * each. Docs shorter than 3 tokens collapse to one partial shingle
    * (concat_ws skips the NULL leads) — mirrored exactly by the DuckDB
    * oracle.
    *
    * Shape: posexplode + windowed `lead(1)/lead(2)` + distinct. A
    * higher-order-function formulation (transform over sequence with
    * toks[i] indexing) is prettier but HOF lambdas are interpreted,
    * not codegen'd — measured 5× slower on this stage. The window
    * shuffle partitions on doc_id (high cardinality, well spread).
    */
  def docShingles(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val wAll = Window.partitionBy(col("doc_id"))
    corpus
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("pos") <= greatest(col("n") - 3, lit(0)))
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs: J(A,B) = |A∩B| / |A∪B| over
    * 3-gram shingle sets, pairs with J ≥ threshold.
    *
    * Shape at scale: the shingle self-join is the standard
    * inverted-index trick — only docs SHARING a shingle ever meet, so
    * cost is Σ(posting-list²) not N². Skew guard for 100 TB: drop
    * ultra-common shingles (posting list > cap) before the join; they
    * contribute nothing to high-Jaccard detection.
    */
  def ngramJaccardPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    // Join on the 31-bit shingle hash, not the string: the shuffle
    // carries 8 bytes per row and hash-compares instead of string
    // compares. Collisions (~N²/2³¹ shingles) shift J by a hair — the
    // oracle mirrors the same hash, so results stay exact-comparable.
    // cache(): four consumers (both join sides + both size branches)
    // would otherwise each re-run the shingle pipeline from the scan;
    // the cached (doc_id, h) set is 16 bytes/row.
    val sh = docShingles(corpus).withColumn("h",
      expr("cast(conv(substring(md5(cast(shingle as binary)), 1, 8), 16, 10) as bigint) % 2147483647"))
      .select(col("doc_id"), col("h"))
      .cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("a"), col("h"))
    val b = sh.select(col("doc_id").as("b"), col("h"))
    val common = a.join(b, "h")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
      .withColumn("jaccard", round(col("c") / (col("sa") + col("sb") - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signatures via the standard one-hash + permutation
    * scheme: each shingle is md5'd ONCE to a 31-bit base hash, then
    * `numHashes` linear permutations `(a_s·h + b_s) mod (2^31−1)` give
    * the per-seed hash family. The permutation constants are fixed
    * literals so the DuckDB oracle reproduces signatures bit-for-bit.
    *
    * Shape: explode shingles, hash each row once (whole-stage codegen),
    * then ONE groupBy(doc) carrying `numHashes` `min` aggregates —
    * partial aggregation collapses each task's rows to one signature
    * per doc before the shuffle, so network traffic is docs×16 longs
    * regardless of corpus size. (A nested-HOF formulation computes the
    * md5 chain once per seed and drops out of codegen — measured 40×
    * slower; don't go back to it.)
    */
  def minhashSignatures(corpus: DataFrame, numHashes: Int): DataFrame = {
    val hashed = docShingles(corpus).withColumn("h",
      expr("cast(conv(substring(md5(cast(shingle as binary)), 1, 8), 16, 10) as bigint) % 2147483647"))
    val mins = (0 until numHashes).map { s =>
      min(expr(s"((${37 + 101 * s} * h + ${13 + 97 * s}) % 2147483647)")).as(s"mh$s")
    }
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .withColumn("minhashes", array((0 until numHashes).map(s => col(s"mh$s")): _*))
      .select(col("doc_id"), col("minhashes"))
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows; docs sharing any (band, band-signature)
    * bucket become candidate pairs. One shuffle on the bucket key; the
    * classic sub-quadratic dedup at corpus scale.
    */
  def minhashLshCandidates(corpus: DataFrame, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(corpus, numHashes)
      .withColumn("band", explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> struct(b as band_id,
           |              array_join(transform(slice(minhashes, b * $rows + 1, $rows),
           |                                   x -> cast(x as string)), ',') as sig))""".stripMargin)))
      .select(col("doc_id"), col("band.band_id"), col("band.sig"))
      // both self-join sides read this; cache beats recomputing the
      // signature aggregation twice (docs × bands rows, tiny)
      .cache()
    val l = sigs.select(col("band_id"), col("sig"), col("doc_id").as("a"))
    val r = sigs.select(col("band_id"), col("sig"), col("doc_id").as("b"))
    l.join(r, Seq("band_id", "sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** Jaccard ESTIMATE from signatures alone: fraction of agreeing
    * minhash positions. For a candidate pair this costs 16 comparisons
    * instead of a shingle join — the cheap triage between LSH
    * candidacy and exact verification (E[est] = J, sd ≈ √(J(1−J)/16)).
    */
  def minhashJaccardEstimates(corpus: DataFrame, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val cands = minhashLshCandidates(corpus, numHashes, bands)
    val sigs = minhashSignatures(corpus, numHashes).cache()
    cands
      .join(sigs.select(col("doc_id").as("a"), col("minhashes").as("sa")), Seq("a"))
      .join(sigs.select(col("doc_id").as("b"), col("minhashes").as("sb")), Seq("b"))
      .select(
        col("a"), col("b"),
        round(
          expr(s"cast(size(filter(zip_with(sa, sb, (x, y) -> x = y), p -> p)) as double) / $numHashes"),
          4).as("j_est"))
  }

  /** The composed production dedup flow: LSH candidates → EXACT
    * Jaccard verification restricted to candidate pairs → keeper
    * assignment (each doc keeps the smallest doc_id among itself and
    * its verified near-dups). This is how the quadratic exact check
    * becomes affordable at corpus scale: it only ever runs on the
    * sub-quadratic candidate set.
    *
    * Keeper rule is one propagation step (min over direct neighbors),
    * not full connected components — at scale CC is an iterative
    * min-propagation loop over this same edge set until fixpoint
    * (usually ≤5 rounds), or GraphFrames/Pregel.
    */
  def lshDedupKeepers(corpus: DataFrame, minJaccard: Double,
                      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val cands = minhashLshCandidates(corpus, numHashes, bands)
    val sh = docShingles(corpus).withColumn("h",
      expr("cast(conv(substring(md5(cast(shingle as binary)), 1, 8), 16, 10) as bigint) % 2147483647"))
      .select(col("doc_id"), col("h"))
      .cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // exact common-shingle counts, computed ONLY for candidate pairs
    val common = cands
      .join(sh.select(col("doc_id").as("a"), col("h")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("h")), Seq("b", "h"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
    val verified = common
      .join(sizes.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
      .filter(round(col("c") / (col("sa") + col("sb") - col("c")), 4) >= minJaccard)
      .select(col("a"), col("b"))
    // undirected neighbor set → keeper = min(self, neighbors)
    val neighbors = verified
      .unionByName(verified.select(col("b").as("a"), col("a").as("b")))
    corpus.select(col("doc_id"))
      .join(neighbors.withColumnRenamed("a", "doc_id"), Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(least(col("doc_id"), coalesce(min(col("b")), col("doc_id"))).as("keep_id"))
  }

  /** 32-bit SimHash fingerprint per doc over its distinct-token bag,
    * plus hamming-0 clustering (identical fingerprints share a cluster
    * keeper). The bit width is 32 so the hex→int conversion is exact in
    * both engines; hamming-≤-k pair search at scale uses the standard
    * bit-band LSH (split the fingerprint into k+1 bands; any pair
    * within distance k shares an exact band) — same join shape as
    * [[minhashLshCandidates]].
    */
  def simhashClusters(corpus: DataFrame): DataFrame = {
    val tok = corpus
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      .withColumn("h", conv(substring(md5(col("token").cast("binary")), 1, 8), 16, 10).cast("long"))
    // One groupBy(doc) with 32 conditional-sum aggregates — no ×32 row
    // explosion, map-side partial aggregation, same math as the
    // per-(doc,bit) formulation the oracle uses.
    val bitAggs = (0 until 32).map { b =>
      sum(expr(s"2 * ((h >> $b) & 1) - 1")).as(s"s$b")
    }
    val fps = tok.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("fp", (0 until 32).map { b =>
        when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _))
      .select(col("doc_id"), col("fp"))
      .cache() // read twice: fingerprint emit + cluster-keeper lookup
    val byFp = fps.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    fps.join(byFp, "fp").select(col("doc_id"), col("fp"), col("keep_id"))
  }

  /** Embedding-cosine near-dup: top `n` most-similar pairs within a
    * bounded id block (both sides < `cap`). The block cap keeps the
    * exact all-pairs cost fixed at any corpus size; the unbounded form
    * at 100 TB goes through [[Sim]]'s IVF/LSH bucketing first and runs
    * this same pairwise scoring within buckets only.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, cap: Int, n: Int): DataFrame = {
    val dotF = Sim.dotNative(embeddings.sparkSession) _
    val e = embeddings
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotF(col("v"), col("v"))))
    val a = e.select(col("vec_id").as("a"), col("v").as("av"), col("nrm").as("an"))
      // the capped block arrives as 1-2 parquet splits; spread the
      // pairwise scoring over all cores
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
    val b = e.select(col("vec_id").as("b"), col("v").as("bv"), col("nrm").as("bn"))
    a.join(broadcast(b), col("a") < col("b"))
      .select(
        col("a"), col("b"),
        round(dotF(col("av"), col("bv")) / (col("an") * col("bn")), 4).as("cos_r"))
      .orderBy(col("cos_r").desc, col("a"), col("b"))
      .limit(n)
  }
}
