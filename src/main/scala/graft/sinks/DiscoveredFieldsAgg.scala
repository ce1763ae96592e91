package graft.sinks

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** E1 as a single typed aggregate expression (SURVEY §2-I's optional
  * `Aggregator` form of the discovered-metric-keys accumulation): a
  * distinct-set union over the metric-key arrays of each record, usable as
  * one column in any `agg(...)` — vs [[Sinks.discoveredFields]]'s
  * explode+distinct plan shape. Buffer is a Set (bounded by the metric-name
  * universe, reference receiver.py:45–46 — dimension-sized, not
  * data-sized); merge is a set union, so partial aggregation composes.
  */
object DiscoveredFieldsAgg extends Aggregator[Seq[String], Set[String], Seq[String]] {
  override def zero: Set[String] = Set.empty
  override def reduce(acc: Set[String], keys: Seq[String]): Set[String] = acc ++ keys
  override def merge(a: Set[String], b: Set[String]): Set[String] = a ++ b
  override def finish(acc: Set[String]): Seq[String] = acc.toSeq.sorted
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
