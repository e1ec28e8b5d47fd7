package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** Salted join must produce exactly the unsalted join's output — salt
  * only changes the shuffle distribution, never the result.
  */
class SaltedJoinSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join output equals plain join output under a hot key") {
    // heavily skewed probe: 900 of 1000 rows share key 7
    val probe = (0 until 1000)
      .map(i => (if (i < 900) 7L else i.toLong % 50, s"p$i"))
      .toDF("k", "payload")
    val build = (0 until 50).map(i => (i.toLong, s"d$i")).toDF("bk", "attr")

    val plain = probe.join(build, $"k" === $"bk")
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val salted = Relational.saltedJoin(probe, build, "k", "bk", salt = 8)
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salted join equals plain join on randomized skews and salt counts") {
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { _ =>
      val hot = rnd.nextInt(20).toLong
      val probe = (0 until 300)
        .map(i => (if (rnd.nextInt(100) < 70) hot else rnd.nextInt(20).toLong, i))
        .toDF("k", "payload")
      val build = (0 until 20).map(i => (i.toLong, s"d$i")).toDF("bk", "attr")
      val salt = 1 + rnd.nextInt(7)
      val plain = probe.join(build, $"k" === $"bk")
        .select("k", "payload", "attr").collect().map(_.toSeq).toSet
      val salted = Relational.saltedJoin(probe, build, "k", "bk", salt)
        .select("k", "payload", "attr").collect().map(_.toSeq).toSet
      assert(salted === plain, s"salt=$salt hot=$hot")
    }
  }

  test("salted join keeps multiplicity when build side has duplicate keys") {
    val probe = Seq((1L, "a"), (1L, "b")).toDF("k", "payload")
    val build = Seq((1L, "x"), (1L, "y")).toDF("bk", "attr")
    val salted = Relational.saltedJoin(probe, build, "k", "bk", salt = 4)
      .select("payload", "attr").collect().map(r => (r.getString(0), r.getString(1)))
    assert(salted.sorted === Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")))
  }
}
