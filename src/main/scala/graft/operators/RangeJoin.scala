package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — an operator Spark's SQL surface only
  * plans as a broadcast-nested-loop / cartesian filter, which is
  * quadratic at cluster scale.
  *
  * Composed from built-ins per the custom-operator preference order:
  * decompose the numeric domain into fixed-width buckets, explode each
  * interval to the buckets it covers (bounded by interval span ÷ width),
  * map each point to its single bucket, and EQUI-join on the bucket id
  * before re-checking the exact bounds. The shuffle key is the bucket id,
  * so the plan is an ordinary shuffled equi-join: linear in points +
  * interval-bucket expansions, never |points| × |intervals|.
  *
  * Pick `bucketWidth` near the typical interval length: width ≫ span
  * wastes no correctness but packs many intervals per bucket (bigger
  * post-join filter fan-in); width ≪ span multiplies the interval-side
  * explode. Heavily overlapped hot ranges surface as bucket-key skew,
  * which AQE's skew-join handling splits like any other shuffle skew.
  */
object RangeJoin {

  /** Floor division that stays exact on integral domains (pmod keeps the
    * remainder non-negative, so negative values bucket toward -inf).
    */
  private def fdiv(c: Column, w: Column): Column =
    ((c - pmod(c, w)) / w).cast("long")

  /** All (point, interval) matches with `loCol <= valueCol < hiCol`
    * (half-open; empty intervals dropped). Output columns: every points
    * column, then every intervals column — callers disambiguate name
    * clashes before joining.
    */
  def pointInInterval(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth ($bucketWidth) must be > 0")
    val w = lit(bucketWidth)
    val pb = points.withColumn("__b", fdiv(col(valueCol), w))
    val ib = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__b",
        explode(sequence(fdiv(col(loCol), w), fdiv(col(hiCol) - 1, w))))
    pb.join(ib, Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }
}
