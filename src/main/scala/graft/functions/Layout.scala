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
}
