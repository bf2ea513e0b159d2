package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored row for [[TopK]]. */
case class Scored(score: Double, id: Long)

/** Exact top-k typed aggregator (SURVEY §7.3's custom-aggregate slot).
  *
  * Keeps the k highest-scoring elements per group in a bounded buffer, so
  * it composes with Structured Streaming state (per-group state is O(k),
  * unlike collect_list + sort) and with `KeyValueGroupedDataset.agg` in
  * batch. Merge is associative/commutative — safe under partial
  * aggregation. Ties break by lower id for determinism.
  */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    ((buf :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    ((b1 ++ b2).sorted(ord)).take(k)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  def apply(k: Int): TopK = new TopK(k)
}
