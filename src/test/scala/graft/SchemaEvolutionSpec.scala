package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Sink schema evolution: an append-only parquet sink accumulates
  * files written under different schema versions (a column added
  * mid-stream is routine in a long-lived pipeline). The read contract:
  * `mergeSchema` unions the versions, old rows surface NULL for new
  * columns, and the upsert path keeps working against the widened
  * sink.
  */
class SchemaEvolutionSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("a column added mid-stream merges; old rows read as null") {
    val dir = Files.createTempDirectory("graft-evolve").toString + "/sink"
    Seq((1L, "click"), (2L, "view"))
      .toDF("event_id", "event_type")
      .write.mode("append").parquet(dir)
    // v2 of the writer adds a column
    Seq((3L, "click", "mobile"))
      .toDF("event_id", "event_type", "device")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("device", "event_id", "event_type"))
    val byId = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("device"))).toMap
    assert(byId === Map(1L -> None, 2L -> None, 3L -> Some("mobile")))
  }

  test("upsert against a schema-widened sink still dedups on the key") {
    val dir = Files.createTempDirectory("graft-evolve2").toString + "/sink"
    Seq((1L, "click")).toDF("event_id", "event_type")
      .write.mode("append").parquet(dir)
    val incoming = Seq((1L, "click", "web"), (2L, "view", "mobile"))
      .toDF("event_id", "event_type", "device")
    // key match on the common column subset: row 1 is a conflict-skip
    val fresh = graft.ops.EventOps.newKeysOnly(
      incoming, spark.read.parquet(dir), Seq("event_id"))
    assert(fresh.collect().map(_.getLong(0)).toSeq === Seq(2L))
  }
}
