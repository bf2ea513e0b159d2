package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed aggregator: at most
  * `capacity` counters of bounded state, mergeable under partial
  * aggregation (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantees:
  *  - state is ≤ `capacity` entries at every point — a 100 TB stream
  *    reduces map-side to a constant-size summary per partition;
  *  - every item with true frequency > n/(capacity+1) is PRESENT in the
  *    result, with estimate ≥ true − n/(capacity+1) (never over-counts
  *    relative to truth after decrements; estimates are lower bounds);
  *  - when the total distinct-item count is ≤ `capacity`, no decrement
  *    ever fires and the summary is EXACT counts, independent of order
  *    and partitioning — the regime the catalog oracle checks.
  *
  * The classic use at scale: detect hot keys cheaply (one pass, O(c)
  * state) to decide WHERE skew mitigation ([[graft.operators.Skew]]
  * salting, AQE skew hints) is worth applying — a full groupBy to find
  * the skew would itself suffer the skew.
  */
class FreqItems(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity ($capacity) must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    if (x == null) m
    else if (m.contains(x)) m.updated(x, m(x) + 1)
    else if (m.size < capacity) m.updated(x, 1L)
    else m.view.mapValues(_ - 1).filter(_._2 > 0).toMap // decrement-all

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (s.size <= capacity) s
    else {
      // subtract the (capacity+1)-th largest count and drop non-positives
      val cut = s.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      s.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqItems {
  def apply(capacity: Int): FreqItems = new FreqItems(capacity)
}
