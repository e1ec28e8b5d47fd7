package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** N1 semantics on the GA4 array-of-struct shape (FIXTURES.md §2):
  * the reference's row loop keeps overwriting without break
  * (`/root/reference/extract_bq.py:155-164`), so the LAST matching
  * param wins; a missing key yields NULL; a null or empty array yields
  * NULL (`extract_bq.py:159` guards on truthiness).
  */
class ParamsExtractSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark

  private val paramType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("string_value", StringType)))))))

  private val schema = StructType(Seq(
    StructField("row_id", IntegerType),
    StructField("event_params", paramType)))

  private def param(k: String, v: String): Row = Row(k, Row(v))

  private val fixture = Seq(
    // last-match-wins: two 'id' params, second must win
    Row(1, Seq(param("id", "first"), param("name", "n1"), param("id", "second"))),
    // missing key → NULL id, present name
    Row(2, Seq(param("name", "only-name"))),
    // null array → NULL
    Row(3, null),
    // empty array → NULL
    Row(4, Seq.empty[Row]),
    // null string_value inside a matching param → NULL (not a crash)
    Row(5, Seq(param("id", null)))
  )

  private lazy val df = spark.createDataFrame(
    spark.sparkContext.parallelize(fixture), schema)

  private def extracted: Map[Int, (Option[String], Option[String])] =
    df.select(
      col("row_id"),
      EventOps.extractParam(col("event_params"), "id").as("event_id"),
      EventOps.extractParam(col("event_params"), "name").as("event_name_detail"))
      .collect()
      .map(r => r.getInt(0) -> (Option(r.getString(1)), Option(r.getString(2))))
      .toMap

  test("last match wins for duplicated keys") {
    assert(extracted(1)._1 === Some("second"))
  }

  test("non-duplicated key extracts normally alongside duplicates") {
    assert(extracted(1)._2 === Some("n1"))
  }

  test("missing key yields NULL") {
    assert(extracted(2)._1 === None)
    assert(extracted(2)._2 === Some("only-name"))
  }

  test("null array yields NULL for every key") {
    assert(extracted(3) === ((None, None)))
  }

  test("empty array yields NULL for every key") {
    assert(extracted(4) === ((None, None)))
  }

  test("matching param with null string_value yields NULL") {
    assert(extracted(5)._1 === None)
  }
}
