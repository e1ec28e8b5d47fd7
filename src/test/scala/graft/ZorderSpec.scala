package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Sinks

/** Pins the z-ordered layout contract: content survives unchanged, and
  * every output file covers a small rectangle of BOTH clustering
  * dimensions — the property parquet min/max skipping needs. A
  * single-column sort is the control: its secondary dimension stays at
  * ~full-range per file, which is exactly what z-ordering fixes.
  */
class ZorderSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private def coverage(dir: String, c: String): Double = {
    // mean per-file fraction of the global value range
    val df = spark.read.parquet(dir)
      .select(col(c).cast("double").as("v"), input_file_name().as("f"))
    val g = df.agg(min("v"), max("v")).head()
    val (lo, hi) = (g.getDouble(0), g.getDouble(1))
    val per = df.groupBy("f").agg((max(col("v")) - min(col("v"))).as("span"))
      .agg(avg("span")).head().getDouble(0)
    per / (hi - lo)
  }

  test("zorderedWrite: content identical; both dims tight per file") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = "target/qtmp/ztest/zorder"
    val sDir = "target/qtmp/ztest/singlesort"
    Sinks.zorderedWrite(orders, "o_custkey", "o_totalprice", zDir, nFiles = 16)
    // control: cluster by custkey alone
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sDir)

    // 1. lossless content
    val back = spark.read.parquet(zDir)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)

    // 2. z-order bounds BOTH dimensions; 16 files over a 16-bit grid
    //    should each cover well under half of each dim's range
    val zCust = coverage(zDir, "o_custkey")
    val zPrice = coverage(zDir, "o_totalprice")
    assert(zCust < 0.5, s"custkey coverage $zCust")
    assert(zPrice < 0.5, s"totalprice coverage $zPrice")

    // 3. the control is tight on its sort key but ~full-range on the
    //    other dim — the gap z-ordering exists to close
    val sPrice = coverage(sDir, "o_totalprice")
    assert(sPrice > 0.8, s"control totalprice coverage $sPrice")
    assert(zPrice < sPrice / 2,
      s"z-order should at least halve the secondary-dim span: $zPrice vs $sPrice")
  }
}
