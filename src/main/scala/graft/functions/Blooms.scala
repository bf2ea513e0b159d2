package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over arbitrary columns.
  *
  * Uses the exact expression pairing Spark's own runtime-filter injection
  * uses — [[BloomFilterAggregate]] over `xxhash64(value)` on the build
  * side, the codegen'd [[BloomFilterMightContain]] over the same hash on
  * the probe side — so the two sides cannot hash-diverge, and the probe
  * stays inside whole-stage codegen (no UDF, no broadcast join).
  *
  * Scale shape: a membership SET of m items costs O(total string bytes)
  * to broadcast-join; its bloom costs ~1.2 MB per million items at 1%
  * fpp regardless of item size, and the probe is a map-side filter in
  * the scan stage. Blooms have no false negatives, so filtering with one
  * before an exact verify step never loses a true match; the fpp tail is
  * removed by the verify.
  */
object Blooms {

  /** Optimal bit count for `expectedItems` at `fpp`:
    * ceil(-n ln p / (ln 2)^2), floored at 64 bits.
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, s"expectedItems ($expectedItems) must be > 0")
    require(fpp > 0 && fpp < 1, s"fpp ($fpp) must be in (0, 1)")
    val ln2 = math.log(2.0)
    math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong max 64L
  }

  /** Aggregate `value` over every row of `df` into one serialized bloom
    * blob (runs one Spark job; map-side partial blooms OR-merge, so the
    * shuffle moves numBits/8 bytes per partition, not rows). The blob is
    * a bounded driver-side model — ~1.2 MB per million items at 1% fpp —
    * the same legitimacy class as the IVF centroid table. Returns None
    * if the aggregate yields no filter (defensive; an empty input
    * normally yields an empty bloom that matches nothing).
    */
  def buildBytes(df: DataFrame, value: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(value))),
      Literal(expectedItems), Literal(optimalNumBits(expectedItems, fpp)))
    val row = df.select(ColumnBridge.column(agg.toAggregateExpression()).as("bloom")).head()
    Option(row.getAs[Array[Byte]](0))
  }

  /** Membership probe of `value` against a built bloom blob: true for
    * every inserted value (no false negatives), true for at most ~fpp of
    * absent values. Codegen'd — safe in the hot path of a scan stage.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(value)))))
}
