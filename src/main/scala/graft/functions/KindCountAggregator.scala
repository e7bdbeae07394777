package graft.functions

import graft.model.Span
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `CountByType` (A1, `TreeQueryExtensions.cs:115-126`) as a typed
  * `Aggregator[Span, Map, Map]` — the didactic UDAF form from SURVEY.md §2.9.
  * Production path remains `groupBy(kind).count()` (partial+final hash agg);
  * this demonstrates the typed-aggregation seam for sketches that have no
  * built-in (per-group maps, HLL-like buffers).
  */
object KindCountAggregator extends Aggregator[Span, Map[String, Long], Map[String, Long]] {
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: Span): Map[String, Long] =
    b.updated(a.kind, b.getOrElse(a.kind, 0L) + 1L)
  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
