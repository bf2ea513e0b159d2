package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys (Z-order / Morton curves).
  *
  * At 100 TB, a table range-partitioned and sorted by one column
  * data-skips on that column only; writing it ordered by the Morton
  * interleave of two columns gives every file a tight min/max envelope
  * on BOTH dimensions, so parquet row-group pruning works for
  * predicates on either — the standard Z-order layout optimization
  * (`repartitionByRange(mortonKey) + sortWithinPartitions(mortonKey)`
  * before the write).
  *
  * Everything here is pure integer shift/mask column math — codegen'd,
  * engine-portable bit-for-bit, and usable both as a sort key and as a
  * deterministic bucket id (`zkey >> (32 - log2(buckets))`).
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions 0,2,..,30
    * (the classic parallel-prefix mask chain).
    */
  def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key: bits of `x` (low 16) on even positions, bits of
    * `y` (low 16) on odd positions. Callers must pre-scale each
    * dimension into [0, 65535] (quantile-rank or min-max scale) — the
    * curve's locality is only as good as the per-dimension spread.
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Inverse of [[spread16]]: gather the even bits back into the low 16. */
  def gather16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0x55555555L))
    val a = m.bitwiseOR(shiftright(m, 1)).bitwiseAND(lit(0x33333333L))
    val b = a.bitwiseOR(shiftright(a, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftright(b, 4)).bitwiseAND(lit(0x00FF00FFL))
    d.bitwiseOR(shiftright(d, 8)).bitwiseAND(lit(0xFFFFL))
  }

  /** Decode a [[morton2]] key back to (x, y). */
  def mortonX(z: Column): Column = gather16(z)
  def mortonY(z: Column): Column = gather16(shiftright(z, 1))

  /** Decompose the Morton image of the box `[x0,x1]×[y0,y1]` (inclusive,
    * 16-bit coords — the [[morton2]] domain) into at most `maxIntervals`
    * sorted, disjoint `[zlo, zhi]` key intervals (the Tropf & Herzog
    * BIGMIN decomposition, done as a z-ordered quadtree walk: a quad
    * fully inside the box is one contiguous z run; a partial quad splits
    * into its four z-ordered children).
    *
    * Uncapped (budget permitting) the union of the intervals is EXACTLY
    * the box's z set. At the cap, further quads fuse into the last
    * interval — a SUPERSET cover. Callers always re-apply the exact
    * x/y box predicate, so over-coverage costs scan rows, never
    * correctness.
    *
    * Why this matters at 100 TB: a table laid out by zkey (partitioned
    * by a zkey prefix, sorted by zkey within) turns each interval into
    * partition pruning + row-group skipping on the SORT column itself —
    * the scan opens only the files/groups whose zkey envelope meets an
    * interval, where the single covering range
    * `[morton2(x0,y0), morton2(x1,y1)]` would drag in every curve
    * excursion between the two corners.
    *
    * Driver-side cost is O(box side) quad visits (sub-millisecond) and
    * the output is ≤ `maxIntervals` pairs — bounded driver state by the
    * capacity taxonomy.
    */
  def zIntervals(x0: Long, x1: Long, y0: Long, y1: Long,
      maxIntervals: Int = 64): Seq[(Long, Long)] = {
    require(0 <= x0 && x0 <= x1 && x1 <= 0xFFFFL, s"x box [$x0,$x1]")
    require(0 <= y0 && y0 <= y1 && y1 <= 0xFFFFL, s"y box [$y0,$y1]")
    require(maxIntervals >= 1, s"maxIntervals $maxIntervals")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // Adjacent-in-z quads merge for free; once the cap is reached every
    // further quad fuses into the last interval (over-covering the gap).
    def emit(zlo: Long, zhi: Long): Unit =
      if (out.nonEmpty && (out.last._2 + 1 >= zlo || out.size >= maxIntervals))
        out(out.size - 1) = (out.last._1, math.max(out.last._2, zhi))
      else out += ((zlo, zhi))
    // quad = [qx, qx+side-1] × [qy, qy+side-1]; z in [zbase, zbase+side²-1]
    def go(level: Int, zbase: Long, qx: Long, qy: Long): Unit = {
      val side = 1L << level
      if (qx > x1 || qx + side - 1 < x0 || qy > y1 || qy + side - 1 < y0) return
      if (qx >= x0 && qx + side - 1 <= x1 && qy >= y0 && qy + side - 1 <= y1) {
        emit(zbase, zbase + side * side - 1); return
      }
      // children in increasing z: quadrant key = (ybit << 1) | xbit
      val h = side >> 1
      val q = h * h
      go(level - 1, zbase, qx, qy)
      go(level - 1, zbase + q, qx + h, qy)
      go(level - 1, zbase + 2 * q, qx, qy + h)
      go(level - 1, zbase + 3 * q, qx + h, qy + h)
    }
    go(16, 0L, 0L, 0L)
    out.toSeq
  }

  /** The box predicate over a z-ordered layout: the [[zIntervals]]
    * OR-chain on the z column (pushed to parquet as range filters on the
    * sort key → row-group skipping; on a zkey-prefix partition column →
    * partition pruning) AND the exact x/y box (drops any over-coverage,
    * including 16-bit aliasing when a dimension exceeds the morton
    * domain — quantization affects pruning granularity, never results).
    */
  def zRangeFilter(zCol: Column, xCol: Column, yCol: Column,
      x0: Long, x1: Long, y0: Long, y1: Long,
      maxIntervals: Int = 64): Column = {
    val zPred = zIntervals(x0, x1, y0, y1, maxIntervals)
      .map { case (lo, hi) => zCol.between(lit(lo), lit(hi)) }
      .reduce(_ || _)
    zPred && xCol.between(lit(x0), lit(x1)) && yCol.between(lit(y0), lit(y1))
  }

  /** The partition values a set of [[zIntervals]] touches under a
    * `zkey >> shift` prefix-bucket partitioning — the driver-side
    * pruning list (bounded by the bucket count).
    */
  def zBuckets(intervals: Seq[(Long, Long)], shift: Int): Seq[Long] =
    intervals.flatMap { case (lo, hi) => (lo >> shift) to (hi >> shift) }
      .distinct.sorted
}
