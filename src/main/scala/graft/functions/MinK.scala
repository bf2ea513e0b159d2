package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A (hash, key) element for [[MinK]]: `h` is the md5 hex of the row key,
  * `k` the key rendered as a string (carried along so the winner set can
  * be joined back to the source rows).
  */
case class HashedKey(h: String, k: String)

/** Bounded "k smallest by (hash, key)" typed aggregator — the scale-safe
  * core of [[graft.operators.Sampling.stratified]].
  *
  * Unlike `row_number().over(Window.partitionBy(stratum))`, which makes
  * WindowExec externally sort EVERY row of a stratum in one task (a
  * terabyte-sized stratum at 100 TB = one task sorting a terabyte), this
  * aggregator's state is a sorted buffer of at most k elements. It
  * participates in partial aggregation: each map task reduces its rows to
  * ≤k survivors before the exchange, so the shuffle moves O(tasks × k)
  * rows per stratum and the final merge is O(parts × k log k).
  *
  * Merge is associative and commutative; ordering is lexicographic on
  * (h, k), which for fixed-width lowercase md5 hex equals the numeric
  * hash order — identical to what a SQL engine computes for
  * `ORDER BY md5(key), key`.
  */
class MinK(k: Int) extends Aggregator[HashedKey, Seq[HashedKey], Seq[HashedKey]] {
  require(k >= 1, s"k ($k) must be >= 1")

  private def lt(a: HashedKey, b: HashedKey): Boolean =
    a.h < b.h || (a.h == b.h && a.k < b.k)

  override def zero: Seq[HashedKey] = Vector.empty

  // buffers are kept sorted ascending, so .last is the current cutoff
  override def reduce(buf: Seq[HashedKey], a: HashedKey): Seq[HashedKey] =
    if (buf.size >= k && !lt(a, buf.last)) buf
    else ((buf :+ a).sortWith(lt)).take(k)

  override def merge(b1: Seq[HashedKey], b2: Seq[HashedKey]): Seq[HashedKey] =
    ((b1 ++ b2).sortWith(lt)).take(k)

  override def finish(reduction: Seq[HashedKey]): Seq[HashedKey] = reduction

  override def bufferEncoder: Encoder[Seq[HashedKey]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[HashedKey]] = ExpressionEncoder()
}

object MinK {
  def apply(k: Int): MinK = new MinK(k)
}
