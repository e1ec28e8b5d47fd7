package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Corpus, EventOps, Text}

/** Randomized laws for the round-5 operators — the invariants a user
  * relies on, checked against brute force on adversarial inputs
  * (timestamp collisions, touch-free users, sub-stride docs).
  */
class Round5Props extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("lastTouchAttribution equals brute force under timestamp collisions") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val nUsers = 1 + rnd.nextInt(4)
      val types = Array("click", "view", "purchase")
      val ev = (0 until 150).map { i =>
        (i.toLong, rnd.nextInt(nUsers).toLong, rnd.nextInt(20).toLong,
          types(rnd.nextInt(3)))
      }
      val got = EventOps.lastTouchAttribution(
          ev.toDF("event_id", "user_id", "ts_us", "event_type"),
          "ts_us", "event_type", "click", "purchase")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      // brute force: order (ts, event_id); the max click ts among rows
      // strictly before the purchase in that order
      val expected = ev.filter(_._4 == "purchase").map { case (id, u, ts, _) =>
        val touches = ev.filter(e =>
          e._2 == u && e._4 == "click" &&
            (e._3 < ts || (e._3 == ts && e._1 < id)))
        id -> (if (touches.isEmpty) None else Some(touches.map(_._3).max))
      }.toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("chunkDocs reconstructs the document: first chunk + tails of the rest") {
    val rnd = new scala.util.Random(23)
    val docs = (0L until 40L).map { i =>
      val len = 1 + rnd.nextInt(700)
      (i, (0 until len).map(j => ('a' + (j * 31 + i.toInt) % 26).toChar).mkString)
    }
    val df = docs.toDF("doc_id", "text")
    val chunks = Corpus.chunkDocs(df, chunkSize = 200, overlap = 50)
      .select("doc_id", "chunk_id", "chunk")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getString(2))
      }
    docs.foreach { case (id, text) =>
      val cs = chunks(id)
      val rebuilt = cs.head + cs.tail.map(_.drop(50)).mkString
      assert(rebuilt === text, s"doc $id len ${text.length}")
    }
  }

  test("bigramLogProb scores are invariant to corpus duplication") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "b c d"), (3L, "d a b c")
    ).toDF("doc_id", "text")
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + 100L).as("doc_id"), col("text")))
    val base = Text.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val dup = Text.bigramLogProb(doubled)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doubling every count leaves every conditional ratio unchanged
    base.foreach { case (id, v) => assert(dup(id) === v, s"doc $id") }
    assert(dup(101L) === base(1L))
  }

  test("assignSplit boundaries partition the corpus (no doc lost or doubled)") {
    val docs = (0L until 300L).map(i => (i, "")).toDF("doc_id", "text")
    val cuts = Seq(("a", 0.3), ("b", 0.7), ("c", 1.0))
    val out = Corpus.assignSplit(docs, cuts)
    assert(out.count() === 300L)
    assert(out.select("doc_id").distinct().count() === 300L)
    assert(out.groupBy("split").count().count() === 3L)
  }
}
