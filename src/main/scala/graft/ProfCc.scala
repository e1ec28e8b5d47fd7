package graft
import org.apache.spark.sql.SparkSession
object ProfCc {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    // mirror the Bench session (cores + shuffle partitions + AQE off)
    // so phase profiles decompose the numbers the bench actually emits
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    Tables.builderConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    SparkEntry.prepare(spark, sfDir)
    if (args.headOption.contains("phases")) {
      // phase breakdown of the CC operator's parts on the same corpus;
      // each phase sampled twice FRESH (flush between) so cold-codegen
      // and steady costs are both visible
      val chain = graft.ops.Dedup
      for (sample <- 1 to 2) {
        CacheScope.flush()
        val c = EntrySupport.chainCorpusForProf(spark, sfDir)
        t(s"[$sample] chain corpus read+cache")(c.count())
        val sh = CacheScope.cached(chain.hashedShingles(c))
        t(s"[$sample] hashedShingles")(sh.count())
        val sigs = CacheScope.cached(chain.minhashSignaturesFromHashedP(sh, 16))
        t(s"[$sample] signatures")(sigs.count())
        t(s"[$sample] lsh candidates")(chain.lshCandidatesFromSigsP(sigs, 16, 4).count())
        val verified = CacheScope.cached(chain.verifiedNearDupPairs(c, 0.7))
        t(s"[$sample] verified edges (LSH+verify)")(verified.count())
        t(s"[$sample] full CC op on top of warm base")(chain.connectedComponentKeepers(c, 0.7).count())
      }
      CacheScope.flush()
      spark.stop(); return
    }
    if (args.headOption.contains("pipe")) {
      // phase breakdown of the corpus_pipeline composition
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("lang"))
      docs.cache(); docs.count()
      for (sample <- 1 to 2) {
        val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
        val deduped = docs.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        t(s"[$sample] dedup window")(deduped.count())
        val gated = graft.ops.Corpus.gopherPass(deduped)
        t(s"[$sample] + gopher")(gated.count())
        val sampled = graft.ops.Corpus.weightedSample(gated, "lang",
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.1)).drop("u_r")
        t(s"[$sample] + sample")(sampled.count())
        t(s"[$sample] + pack (full)")(
          graft.ops.Corpus.packSequences(sampled, 64, 2048, carry = Seq("lang")).count())
        t(s"[$sample] gopher alone on docs")(graft.ops.Corpus.gopherPass(docs).count())
      }
      spark.stop(); return
    }
    // per-query job/stage/task counters — the floor is
    // (#jobs × job-launch) + (#stages × stage-launch); these tell us
    // which queries pay it and why
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    if (args.headOption.contains("floor")) {
      // what does ONE job actually cost on this host/session?
      import org.apache.spark.sql.functions._
      for (r <- 1 to 3) {
        t(s"[$r] 20 single-stage jobs")(
          (1 to 20).foreach(_ => spark.range(100000).agg(sum(col("id"))).collect()))
        t(s"[$r] 10 two-stage shuffle jobs")(
          (1 to 10).foreach(i => spark.range(100000).groupBy(col("id") % 7).count().count()))
        val ev = Tables.events(spark, sfDir); ev.cache(); ev.count()
        t(s"[$r] 10 cached-scan agg jobs")(
          (1 to 10).foreach(_ => ev.agg(max(col("value"))).collect()))
      }
      spark.stop(); return
    }
    val names = if (args.isEmpty) Array("q_dedup_cc") else args
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      for (i <- 1 to 3) {
        CacheScope.flush()
        val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
        t(s"$n sample $i")(fn(spark, sfDir).count())
        Thread.sleep(80)
        println(s"[prof]   jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - k0}")
      }
    }
    spark.stop()
  }
}
