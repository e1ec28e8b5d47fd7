package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Relational, Text}

/** Randomized laws for the batch-8 operators, checked against brute
  * force on adversarial inputs (multi-day gaps, all-null runs,
  * duplicate tokens, single-event keys).
  */
class Batch8Props extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val dayUs = 86400000000L

  test("gapFillDaily equals brute force: dense spine, preserved totals") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val keys = Array("a", "b", "c")
      val ev = (0 until 120).map { i =>
        (i.toLong, keys(rnd.nextInt(keys.length)),
          rnd.nextInt(15).toLong * dayUs + rnd.nextInt(1000).toLong)
      }
      val got = Relational.gapFillDaily(
          ev.toDF("event_id", "k", "ts_us"), "k", "ts_us")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      // brute force per key: count per day, spine min..max zero-filled
      val expected = ev.groupBy(_._2).flatMap { case (k, rows) =>
        val byDay = rows.groupBy(_._3 / dayUs).map { case (d, r) => d -> r.size.toLong }
        val (lo, hi) = (byDay.keys.min, byDay.keys.max)
        (lo to hi).map { d =>
          val day = java.time.LocalDate.ofEpochDay(d)
            .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE)
          (k, day, byDay.getOrElse(d, 0L))
        }
      }.toSet
      assert(got === expected, s"trial $trial")
      // spine totals preserve the raw event count
      assert(got.toSeq.map(_._3).sum === ev.size.toLong, s"trial $trial totals")
    }
  }

  test("forwardFill equals a sequential scan for any null pattern") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 4) {
      val rows = (0 until 100).map { i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(30).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextInt(10).toDouble) else None)
      }
      val got = Relational.forwardFill(
          rows.toDF("event_id", "k", "ord", "v"), "k", Seq("ord", "event_id"), "v")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double]))
        .toMap
      val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
        var lastSeen: Option[Double] = None
        rs.sortBy(r => (r._3, r._1)).map { r =>
          if (r._4.isDefined) lastSeen = r._4
          r._1 -> lastSeen
        }
      }
      assert(got === expected, s"trial $trial")
    }
  }

  test("tokenEntropy matches direct computation and is bounded by ln(distinct)") {
    val rnd = new scala.util.Random(41)
    val vocab = Array("a", "bb", "c", "dd", "e")
    val docs = (0L until 30L).map { i =>
      (i, (0 until 1 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val got = Text.tokenEntropy(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).map(_._2.length.toDouble)
      val n = toks.length.toDouble
      val h = math.log(n) - counts.map(c => c * math.log(c)).sum / n
      val (gn, gh) = got(id)
      assert(gn === toks.length.toLong)
      assert(math.abs(gh - math.rint(h * 1e4) / 1e4) < 1e-9, s"doc $id")
      assert(gh <= math.log(counts.size.toDouble) + 1e-4, s"doc $id bound")
    }
  }
}
