package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

/** Planted-case pins for Corpus.htmlExtract — the crawl front door
  * (script/style strip, tag strip, entity decode, link-density chrome
  * gate, malformed-markup quarantine). The oracle pins exact values on
  * the constructed corpus; this pins the SEMANTICS each planted case
  * exists to prove, plus the downstream-gate composition.
  */
class HtmlExtractSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def extract(pages: (Long, String)*) =
    Corpus.htmlExtract(pages.toSeq.toDF("doc_id", "html"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean page: tags stripped, entities decoded, script/style gone") {
    val out = extract((1L,
      "<html><head><style>p{color:red}</style>" +
        "<script>var t = 1;</script></head>" +
        "<body><p>R&amp;D says x &lt; y &gt; 0 &quot;q&quot;&nbsp;end</p>" +
        "</body></html>"))
    val r = out(1L)
    assert(r.getAs[String]("status") === "ok")
    assert(r.getAs[String]("head_50") === "R&D says x < y > 0 \"q\" end")
    assert(r.getAs[Long]("n_links") === 0L)
    assert(r.getAs[Long]("n_toks") === 9L)
    // neither the style body nor the script body survives
    assert(!r.getAs[String]("head_50").contains("color"))
  }

  test("entity double-decode guard: &amp;lt; yields the TEXT &lt;") {
    val out = extract((2L, "<p>a &amp;lt; b</p>"))
    assert(out(2L).getAs[String]("head_50") === "a &lt; b")
  }

  test("link farm crosses the density gate; prose page does not") {
    val farm = (0 until 30).map(i => s"""<a href="/p$i">anchor$i</a>""")
      .mkString(" ")
    val prose = "plain words " * 40
    val out = extract(
      (3L, s"<body><nav>$farm</nav><p>tiny</p></body>"),
      (4L, s"<body><nav><a href='/'>home</a></nav><p>$prose</p></body>"))
    assert(out(3L).getAs[String]("status") === "chrome")
    assert(out(4L).getAs[String]("status") === "ok")
    assert(out(3L).getAs[Long]("n_links") === 30L)
    assert(out(4L).getAs[Double]("link_density") <
      out(3L).getAs[Double]("link_density"))
  }

  test("unclosed <script> quarantines the page with NULL extraction") {
    val out = extract(
      (5L, "<body><script>var broken = [<p>never extracted</p></body>"),
      // BALANCED multi-script page stays ok — the count check is not
      // fooled by several well-formed scripts
      (6L, "<body><script>a()</script><p>kept</p><script>b()</script></body>"))
    val q = out(5L)
    assert(q.getAs[String]("status") === "quarantined")
    assert(q.isNullAt(q.fieldIndex("n_links")))
    assert(q.isNullAt(q.fieldIndex("n_chars")))
    assert(q.isNullAt(q.fieldIndex("link_density")))
    assert(q.isNullAt(q.fieldIndex("head_50")))
    assert(out(6L).getAs[String]("status") === "ok")
    assert(out(6L).getAs[String]("head_50") === "kept")
  }

  test("whitespace normalizes to single spaces; empty body yields 0 tokens") {
    val out = extract(
      (7L, "<body><p>a</p>\n\n<p>b</p>\t <p>c</p></body>"),
      (8L, "<body><div></div></body>"))
    assert(out(7L).getAs[String]("head_50") === "a b c")
    assert(out(7L).getAs[Long]("n_toks") === 3L)
    assert(out(8L).getAs[Long]("n_toks") === 0L)
    assert(out(8L).getAs[Long]("n_chars") === 0L)
    assert(out(8L).isNullAt(out(8L).fieldIndex("link_density")))
  }

  test("keepText hands the full extraction to the downstream quality gate") {
    val prose = (1 to 60).map(i => s"word$i").mkString(" ")
    val pages = Seq(
      (9L, s"<body><p>$prose</p></body>"),
      (10L, "<body><script>x = [</body>")).toDF("doc_id", "html")
    val extracted = Corpus.htmlExtract(pages, keepText = true)
      .filter(col("status") === "ok")
      .select(col("doc_id"), col("text"))
    // composition: the extraction IS the corpus the Gopher gate reads
    val gated = Corpus.gopherSignals(extracted).collect()
    assert(gated.map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("streaming twin routes and extracts exactly like the batch operator") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft-html-stream").toString
    val pages = Seq(
      (1L, "<body><p>R&amp;D one " + ("w " * 60).trim + "</p></body>"),
      (2L, "<body><script>broken = [<p>gone</p></body>"),
      (3L, "<body>" + (0 until 30).map(i =>
        s"""<a href="/$i">a$i</a>""").mkString(" ") + "<p>tiny</p></body>"))
    pages.toDF("doc_id", "html").write.parquet(s"$base/src")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("html", StringType)))
    graft.streaming.StreamingCorpus.htmlExtractStream(
      spark, s"$base/src", schema, s"$base/ckpt",
      s"$base/good", s"$base/quarantine").awaitTermination()
    val good = spark.read.parquet(s"$base/good").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("text"))).toMap
    assert(good.keySet === Set(1L, 3L))
    assert(good(1L)._1 === "ok" && good(1L)._2.startsWith("R&D one"))
    assert(good(3L)._1 === "chrome")
    assert(spark.read.parquet(s"$base/quarantine")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // streamed rows ≡ the batch operator's on the same pages
    val batch = Corpus.htmlExtract(pages.toDF("doc_id", "html"),
        keepText = true)
      .filter(col("status") =!= "quarantined")
      .collect().map(_.toString).sorted.toSeq
    val streamed = spark.read.parquet(s"$base/good")
      .select("doc_id", "status", "n_links", "link_chars", "n_chars",
        "link_density", "n_toks", "head_50", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }

  test("htmlMeta: directives gate, canonical groups count, absences are NULL") {
    val pages = Seq(
      (1L, "<head><title>t1</title>" +
        "<meta name=\"robots\" content=\"noindex, nofollow\">" +
        "<link rel=\"canonical\" href=\"https://ex.com/c/1\"></head>"),
      (2L, "<head><title>t2</title>" +
        "<link rel=\"canonical\" href=\"https://ex.com/c/1\"></head>"),
      (3L, "<head><meta name=\"robots\" content=\"index, follow\"></head>"),
      (4L, "<head></head>")).toDF("doc_id", "html")
    val out = Corpus.htmlMeta(pages).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("verdict") === "drop")
    assert(out(1L).getAs[Long]("nofollow") === 1L)
    assert(out(2L).getAs[String]("verdict") === "index")
    // docs 1 and 2 share a canonical target — the collapse size
    assert(out(1L).getAs[Long]("n_same_canonical") === 2L)
    assert(out(2L).getAs[Long]("n_same_canonical") === 2L)
    // no canonical → singleton group, NULL fields surface as NULL
    assert(out(3L).getAs[Long]("n_same_canonical") === 1L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("canonical")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("title")))
    assert(out(4L).getAs[Long]("noindex") === 0L)
    assert(out(4L).getAs[String]("verdict") === "index")
  }

  test("htmlMeta composes with canonicalUrlDedup: publisher hints collapse variants") {
    val pages = Seq(
      (10L, "<head><link rel=\"canonical\" href=\"https://Ex.com/a?utm=1\"></head>"),
      (11L, "<head><link rel=\"canonical\" href=\"https://ex.com/a/\"></head>"),
      (12L, "<head><link rel=\"canonical\" href=\"https://ex.com/b\"></head>"))
      .toDF("doc_id", "html")
    val urls = Corpus.htmlMeta(pages)
      .filter(col("canonical").isNotNull)
      .select(col("doc_id"), col("canonical").as("url"))
    // the URL canonicalizer then collapses host-case/query/slash
    // variants of the publisher hints themselves
    val dedup = graft.ops.Text.canonicalUrlDedup(urls)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("keep_id")).toMap
    assert(dedup(10L) === dedup(11L), "variant canonical hints must collapse")
    assert(dedup(12L) !== dedup(10L))
  }

  test("crawl-pipeline keeper law: one keeper per canonical group among " +
      "survivors; gate-failed docs never keep") {
    // replicate the declared query's composition on planted pages:
    // docs 1,2 share a canonical (2 survives only as non-keeper),
    // doc 5 is noindex (meta gate), doc 13 is malformed (content gate)
    val mk = (id: Long, noindex: Boolean, canon: Option[String], body: String) =>
      (id, "<html><head>" +
        (if (noindex) "<meta name=\"robots\" content=\"noindex, nofollow\">" else "") +
        canon.map(c => s"""<link rel="canonical" href="$c">""").getOrElse("") +
        s"</head><body>$body</body></html>")
    val prose = (1 to 40).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      mk(1L, false, Some("https://ex.com/c/0"), s"<p>$prose</p>"),
      mk(2L, false, Some("https://ex.com/c/0"), s"<p>$prose extra</p>"),
      mk(5L, true, None, s"<p>$prose</p>"),
      mk(13L, false, None, "<script>broken = [<p>x</p>"),
      mk(20L, false, None, s"<p>$prose</p>")).toDF("doc_id", "html")
    val meta = Corpus.htmlMeta(pages).select(col("doc_id"), col("verdict"),
      col("canonical"))
    val ext = Corpus.htmlExtract(pages).select(col("doc_id"), col("status"))
    val joined = ext.join(meta, Seq("doc_id"))
      .withColumn("passes",
        (col("status") === "ok" && col("verdict") === "index").cast("long"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canonical")).orderBy(col("doc_id"))
    val ranked = joined
      .filter(col("passes") === 1L && col("canonical").isNotNull)
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), (col("rn") === 1).cast("long").as("is_keeper"))
    val kept = joined.join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("passes") === 0L, lit(0L))
          .otherwise(coalesce(col("is_keeper"), lit(1L))).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === Map(1L -> 1L, 2L -> 0L, 5L -> 0L, 13L -> 0L, 20L -> 1L))
  }

  test("crawlGate fusion law: the one-pass projection equals htmlExtract " +
      "x htmlMeta on every shared field, incl. the keepText handoff") {
    // every hazard class in one frame: clean, entity-laden, link farm,
    // unclosed script, noindex, canonical pair, empty body
    val farm = (0 until 30).map(i => s"""<a href="/p$i">anchor$i</a>""")
      .mkString(" ")
    val prose = (1 to 40).map(i => s"w$i").mkString(" ")
    val pages = Seq(
      (1L, s"<html><head><link rel=\"canonical\" href=\"https://ex.com/c/0\">" +
        s"</head><body><p>$prose</p></body></html>"),
      (2L, s"<html><head><link rel=\"canonical\" href=\"https://ex.com/c/0\">" +
        s"</head><body><p>$prose extra</p></body></html>"),
      (3L, "<html><head><meta name=\"robots\" content=\"noindex, nofollow\">" +
        "</head><body><p>a &amp;lt; b &quot;q&quot;</p></body></html>"),
      (4L, s"<body><nav>$farm</nav><p>tiny</p></body>"),
      (5L, "<body><script>broken = [<p>never</p></body>"),
      (6L, "<body></body>")).toDF("doc_id", "html")
    val fused = Corpus.crawlGate(pages, linkDensityPct = 30, keepText = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ext = Corpus.htmlExtract(pages, linkDensityPct = 30, keepText = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    val meta = Corpus.htmlMeta(pages)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(fused.keySet === ext.keySet)
    fused.foreach { case (id, f) =>
      assert(f.getAs[String]("status") === ext(id).getAs[String]("status"), s"doc $id")
      assert(f.getAs[java.lang.Long]("n_toks") === ext(id).getAs[java.lang.Long]("n_toks"), s"doc $id")
      assert(f.getAs[String]("text") === ext(id).getAs[String]("text"), s"doc $id")
      assert(f.getAs[String]("canonical") === meta(id).getAs[String]("canonical"), s"doc $id")
      assert(f.getAs[String]("verdict") === meta(id).getAs[String]("verdict"), s"doc $id")
    }
    // and the hazard classes actually exercised what they plant
    assert(fused(5L).getAs[String]("status") === "quarantined")
    assert(fused(4L).getAs[String]("status") === "chrome")
    assert(fused(3L).getAs[String]("verdict") === "drop")
    assert(fused(1L).getAs[String]("canonical") === "https://ex.com/c/0")
  }

  test("empty input survives (first-run-of-the-day contract)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "html")
    assert(Corpus.htmlExtract(empty).count() === 0)
  }

  test("linkDensityPct is validated loudly") {
    val pages = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException] {
      Corpus.htmlExtract(pages, linkDensityPct = 0)
    }
  }
}
