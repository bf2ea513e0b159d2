package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Beyer et al., "On
  * synopses for distinct value estimation under multiset operations",
  * SIGMOD 2007): hash every element to a uniform, keep the k smallest
  * DISTINCT hash values; with u_k the k-th smallest as a fraction of the
  * hash space, D̂ = (k-1)/u_k.
  *
  * The input is the first 13 hex digits (52 bits) of the element's md5,
  * as a long. 2^52 matters: u = u52 / 2^52 is an EXACT IEEE double
  * (power-of-two divisor, 52-bit numerator = double mantissa width), so
  * the estimate (k-1)/u is ONE correctly-rounded division — any engine
  * that can take an md5 prefix computes the bit-identical estimate.
  * Like [[Hdr]], that turns the sketch ESTIMATE itself into a
  * hash-comparable oracle target, where HLL++ internals only support a
  * bound check.
  *
  * Scale shape: state is a sorted-distinct buffer of ≤ k longs;
  * duplicates dedup INSIDE the buffer (an element already present, or
  * above the current k-th value, is a no-op), so no exact-distinct
  * shuffle precedes the sketch — each map task reduces its rows to ≤ k
  * values before the exchange, and merge is a bounded sorted-union.
  * That is the whole point vs `countDistinct`'s per-group hash set.
  */
private[functions] object KmvOps {
  /** Insert preserving the sorted-distinct-bounded invariant. */
  def reduce(k: Int, buf: Seq[Long], v: Long): Seq[Long] =
    if (buf.size >= k && v >= buf.last) buf
    else {
      val i = searchInsert(buf, v)
      if (i < buf.size && buf(i) == v) buf // duplicate hash: a no-op
      else ((buf.take(i) :+ v) ++ buf.drop(i)).take(k)
    }

  def merge(k: Int, b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  private def searchInsert(buf: Seq[Long], v: Long): Int = {
    var lo = 0; var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
}

class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Long] {
  require(k >= 2, s"k ($k) must be >= 2 — the estimator divides by u_k with k-1 on top")

  override def zero: Seq[Long] = Vector.empty

  // buffer invariant: sorted ascending, distinct, size <= k
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = KmvOps.reduce(k, buf, v)

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = KmvOps.merge(k, b1, b2)

  /** The k-th smallest distinct hash (the estimator's u_k numerator), or
    * -1 when fewer than k distinct values were seen — the caller filters
    * (fewer than k distinct means exact counting was cheap anyway).
    */
  override def finish(reduction: Seq[Long]): Long =
    if (reduction.size < k) -1L else reduction.last

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}

object KmvSketch {
  def apply(k: Int): KmvSketch = new KmvSketch(k)
}

/** Same bounded sketch, but FINISHES with the whole k-min buffer instead
  * of just u_k — the form KMV set algebra needs: union of two sets is
  * `merge` of their buffers; with K the k smallest of the union and
  * ρ = |{x ∈ K : x ∈ A's buffer ∧ x ∈ B's buffer}|, the intersection
  * estimate is (ρ/k) · D̂_union (Beyer et al., SIGMOD 2007 §4). Buffers
  * are tiny (k longs per group), so the set algebra itself runs as plain
  * array expressions over one row per group.
  */
class KmvBuffer(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k ($k) must be >= 2")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = KmvOps.reduce(k, buf, v)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = KmvOps.merge(k, b1, b2)
  override def finish(reduction: Seq[Long]): Seq[Long] = reduction
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object KmvBuffer {
  def apply(k: Int): KmvBuffer = new KmvBuffer(k)
}
