package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Relational

/** The HLL sketch path must track the exact count within its error
  * bound — the contract that makes it substitutable at scale.
  */
class ApproxDistinctSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx distinct within 5% of exact on 10k users") {
    val rnd = new scala.util.Random(7)
    val events = (0 until 50000)
      .map(_ => (if (rnd.nextBoolean()) "click" else "view", rnd.nextInt(10000).toLong))
      .toDF("event_type", "user_id")
    val exact = Relational.distinctUsersPerType(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.approxDistinctUsersPerType(events, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.10, s"$k: exact=$n approx=$a")
    }
  }
}
