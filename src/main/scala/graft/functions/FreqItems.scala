package graft.functions

import scala.collection.mutable

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
  * The buffer is a MUTABLE map updated in place: Spark's ScalaAggregator
  * is a TypedImperativeAggregate, so the buffer lives as one JVM object
  * per group within a partition and only crosses the encoder at the
  * partial/merge exchange — an immutable `Map.updated` per input row
  * would allocate a fresh node chain per row inside the hottest loop of
  * a 100 TB scan.
  *
  * The classic use at scale: detect hot keys cheaply (one pass, O(c)
  * state) to decide WHERE skew mitigation ([[graft.operators.Skew]]
  * salting, AQE skew hints) is worth applying — a full groupBy to find
  * the skew would itself suffer the skew.
  */
class FreqItems(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity ($capacity) must be >= 1")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], x: String): mutable.Map[String, Long] = {
    if (x == null) return m
    m.get(x) match {
      case Some(c) => m.update(x, c + 1)
      case None if m.size < capacity => m.update(x, 1L)
      case None => // decrement-all, in place
        m.mapValuesInPlace((_, v) => v - 1)
        m.filterInPlace((_, v) => v > 0)
    }
    m
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count and drop non-positives
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0)
    }
    a
  }

  override def finish(reduction: mutable.Map[String, Long]): Map[String, Long] =
    reduction.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqItems {
  def apply(capacity: Int): FreqItems = new FreqItems(capacity)
}
