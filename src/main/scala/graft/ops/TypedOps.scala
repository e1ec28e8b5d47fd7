package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface over the events stream — the API tier
  * for pipeline steps where compile-time row shape matters (ETL
  * handoffs between teams, refactoring safety), per SURVEY §7's
  * "Dataset where type safety helps, DataFrame where schema is
  * dynamic" split.
  *
  * Everything here compiles to the SAME Catalyst plans as the untyped
  * operators (typed `filter`/`select` on columns stay in codegen;
  * `groupByKey.agg(typedAggregator)` is a regular partial-aggregated
  * hash aggregate, shuffled once on the key). The one exception is
  * lambda-based `Dataset.filter(f: T => Boolean)` / `mapGroups`, which
  * deserialize rows — kept out of the hot paths and demonstrated only
  * where genuine per-group imperative logic wants objects
  * (TypedOpsSpec pins plan-equivalence of results either way).
  */
object TypedOps {

  /** The typed view of the events table (post-normalization: ts_us
    * micros, not raw nanos). user_id is Option — the column is
    * nullable in the schema and `None` survives encoding.
    */
  final case class Event(
      event_id: Long, user_id: Option[Long], ts_us: Long,
      event_type: String, value: Double)

  implicit val eventEncoder: Encoder[Event] = Encoders.product[Event]

  /** Narrow the raw frame to the typed shape. Column selection happens
    * BEFORE the as[]: the encoder then binds by name and the scan
    * prunes to exactly these five columns.
    */
  def asEvents(events: DataFrame): Dataset[Event] =
    events
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("value"))
      .as[Event]

  /** Typed column-expression filter — stays in whole-stage codegen
    * (no deserialization), unlike `ds.filter(_.event_type == t)`.
    */
  def ofType(ds: Dataset[Event], t: String): Dataset[Event] =
    ds.filter(col("event_type") === t)

  /** Typed custom aggregator: total value per key, written once and
    * reusable on any Dataset[Event] grouping. Compiles to a standard
    * two-phase (partial + final) hash aggregate — the typed API costs
    * nothing at the plan level.
    */
  object SumValue extends Aggregator[Event, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, e: Event): Double = b + e.value
    def merge(a: Double, b: Double): Double = a + b
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-user event count + value total via groupByKey + typed
    * aggregators. Keys are Option[Long]; None groups the null users.
    */
  def perUserTotals(ds: Dataset[Event]): Dataset[(Option[Long], Long, Double)] =
    ds.groupByKey(_.user_id)(ExpressionEncoderHelp.optionLong)
      .agg(
        SumValue.toColumn.name("total_value"),
        org.apache.spark.sql.functions.count(lit(1)).as("n").as[Long](Encoders.scalaLong))
      .map { case (k, total, n) => (k, n, total) }(
        Encoders.tuple(ExpressionEncoderHelp.optionLong, Encoders.scalaLong, Encoders.scalaDouble))

  /** Genuine per-group imperative logic — the mapGroups tier: the
    * longest run of consecutive events of the same type per user,
    * something a SQL window can express only awkwardly. Deserializes
    * one group at a time; use only when object logic earns it.
    */
  def longestRunPerUser(ds: Dataset[Event]): Dataset[(Option[Long], Int)] = {
    implicit val outEnc: Encoder[(Option[Long], Int)] =
      Encoders.tuple(ExpressionEncoderHelp.optionLong, Encoders.scalaInt)
    ds.groupByKey(_.user_id)(ExpressionEncoderHelp.optionLong)
      .mapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
        var best, cur = 0
        var prev: String = null
        sorted.foreach { e =>
          cur = if (e.event_type == prev) cur + 1 else 1
          prev = e.event_type
          if (cur > best) best = cur
        }
        (uid, best)
      }
  }
}

/** Encoder for Option[Long] keys (Encoders has no direct factory). */
private[ops] object ExpressionEncoderHelp {
  val optionLong: Encoder[Option[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Long]]()
}
