package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, EventOps, Mutations, Relational}

/** Randomized laws for the batch-10/11 operators, checked against
  * brute force on adversarial inputs (timestamp collisions, single-row
  * keys, all-equal values).
  */
class Batch10Props extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("ewma equals brute force over random streams with ts collisions") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 4) {
      val ev = (0 until 120).map { i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(15).toLong,
          math.round(rnd.nextDouble() * 1000) / 100.0)
      }
      val got = Relational.ewma(
          ev.toDF("event_id", "user_id", "ts_us", "v"),
          "user_id", "ts_us", "event_id", "v", alpha = 0.5, frame = 8)
        .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("ewma_r"))).toMap
      val byUser = ev.groupBy(_._2)
      val expected = byUser.flatMap { case (_, rows) =>
        val ordered = rows.sortBy(e => (e._3, e._1))
        ordered.zipWithIndex.map { case (e, i) =>
          val frame = ordered.slice(math.max(0, i - 7), i + 1)
          val num = frame.zipWithIndex.map { case (f, j) =>
            f._4 * math.pow(0.5, i - (math.max(0, i - 7) + j)) }.sum
          val den = frame.indices.map(j =>
            math.pow(0.5, i - (math.max(0, i - 7) + j))).sum
          e._1 -> BigDecimal(num / den).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
      assert(got === expected, s"trial $trial")
    }
  }

  test("transitionMatrix: probabilities normalize to 1 per source state") {
    val rnd = new scala.util.Random(37)
    val types = Array("a", "b", "c", "d")
    val ev = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, types(rnd.nextInt(4)))
    }
    val rows = EventOps.transitionMatrix(
        ev.toDF("event_id", "user_id", "ts_us", "event_type"),
        "ts_us", "event_type")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (state, rs) =>
      val total = rs.map(_.getDouble(rs.head.fieldIndex("p_r"))).sum
      assert(math.abs(total - 1.0) < 0.01, s"state $state sums to $total")
    }
    // counts are consistent: n / sum(n per state) rounds to p_r
    val byState = rows.groupBy(_.getString(0))
    byState.values.foreach { rs =>
      val sum = rs.map(_.getLong(2)).sum.toDouble
      rs.foreach { r =>
        val expect = BigDecimal(r.getLong(2) / sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(r.fieldIndex("p_r")) === expect)
      }
    }
  }

  test("winsorize: clipped values stay inside the band and preserve order") {
    val rnd = new scala.util.Random(41)
    val df = (0 until 300).map(i => ("g" + (i % 3), rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val out = Corpus.winsorize(df, "g", "v", 0.05, 0.95)
      .groupBy(col("g"))
      .agg(
        min(col("clipped_r")).as("lo"), max(col("clipped_r")).as("hi"),
        expr("percentile(v, 0.05)").as("p05"), expr("percentile(v, 0.95)").as("p95"),
        // clipping is monotone: corr of (v, clipped) stays positive
        corr(col("v"), col("clipped_r")).as("c"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("lo")) >= r.getDouble(r.fieldIndex("p05")) - 1e-4)
      assert(r.getDouble(r.fieldIndex("hi")) <= r.getDouble(r.fieldIndex("p95")) + 1e-4)
      assert(r.getDouble(r.fieldIndex("c")) > 0.9)
    }
  }

  test("snapshotDiff: statuses partition the key union, diff is invertible") {
    val rnd = new scala.util.Random(43)
    val oldKeys = (0 until 60).map(_ => rnd.nextInt(40)).distinct
    val newKeys = (0 until 60).map(_ => rnd.nextInt(40)).distinct
    val oldS = oldKeys.map(k => (k.toLong, (k % 7).toLong)).toDF("k", "n")
    val newS = newKeys.map(k => (k.toLong, (k % 5).toLong)).toDF("k", "n")
    val out = Mutations.snapshotDiff(oldS, newS, Seq("k"), Seq("n"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("status"))).toMap
    assert(out.keySet === (oldKeys ++ newKeys).map(_.toLong).toSet)
    out.foreach { case (k, st) =>
      val inOld = oldKeys.contains(k.toInt); val inNew = newKeys.contains(k.toInt)
      val expect =
        if (!inOld) "added"
        else if (!inNew) "removed"
        else if (k % 7 == k % 5) "same"
        else "changed"
      assert(st === expect, s"key $k")
    }
  }

  test("boilerplate: planted banner flags exactly the planted docs; fractions bounded") {
    val rnd = new scala.util.Random(59)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val banner = "one two three four five"
    val docs = (0L until 40L).map { i =>
      val body = Seq.fill(10 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      // banner as PREFIX on evens: segment 0 is identical across them
      (i, if (i % 2 == 0) s"$banner $body" else body)
    }
    val out = Corpus.boilerplate(docs.toDF("doc_id", "text"), segLen = 5, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("n_segs")), r.getLong(r.fieldIndex("n_boiler")),
          r.getDouble(r.fieldIndex("boiler_frac_r"))))
      .toMap
    out.foreach { case (id, (nSegs, nBoiler, frac)) =>
      assert(nBoiler <= nSegs, s"doc $id")
      assert(frac >= 0.0 && frac <= 1.0, s"doc $id")
      if (id % 2 == 0)
        assert(nBoiler >= 1, s"planted doc $id must flag its banner segment")
    }
    // random 2-letter-token segments CAN collide across docs (tiny
    // vocabulary) — the guarantee is one-sided: planted docs always flag
  }

  test("lengthBand: keep fraction tracks the band width per group") {
    val rnd = new scala.util.Random(61)
    val docs = (1L to 200L).map(i => (i, "g" + (i % 2), 10L + rnd.nextInt(1000)))
      .toDF("doc_id", "lang", "n_chars")
    val out = Corpus.lengthBand(docs, "lang", "n_chars", 0.1, 0.9)
      .groupBy(col("lang"))
      .agg(avg(when(col("keep"), 1.0).otherwise(0.0)).as("kept"), count(lit(1)).as("n"))
      .collect()
    out.foreach { r =>
      val kept = r.getDouble(1)
      // percent_rank in [0.1, 0.9] keeps ~80% of each group (±ties/edges)
      assert(kept > 0.7 && kept < 0.9, s"lang ${r.getString(0)} kept $kept")
    }
  }

  test("keySkewProfile: shares sum to <= 1 and top-k is the true top-k") {
    val rnd = new scala.util.Random(47)
    val df = (0 until 500).map(_ => math.abs(rnd.nextGaussian() * 10).toLong % 30)
      .toDF("k")
    val out = Relational.keySkewProfile(df, "k", 10).collect()
    val trueCounts = df.groupBy(col("k")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(r => (-r._2, r._1)).take(10)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === trueCounts.toSeq)
    assert(out.map(_.getDouble(2)).sum <= 1.0 + 1e-6)
  }
}
