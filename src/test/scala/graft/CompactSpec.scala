package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Sinks

class CompactSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("compact merges many small append files without losing rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/sink"
    // 10 appends → at least 10 files
    (0 until 10).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 10)
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet

    Sinks.compact(spark, dir, numFiles = 2)

    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after <= 2)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet === rowsBefore)
  }
}
