package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior) join — an operator Spark's SQL surface lacks.
  *
  * Composed from built-ins per the custom-operator preference order
  * (compose > custom plan): tag both inputs, union, and take a running
  * `last(value, ignoreNulls)` over (key, time) — one shuffle on the key,
  * no range self-join blowup. Equal timestamps resolve like ASOF's
  * `right.ts <= left.ts` (the right row sorts first and is visible).
  * At scale this is the streamed formulation: sort-merge within key
  * partitions, O(n) per key, skew handled by AQE like any window.
  *
  * Determinism: multiple right rows with identical (key, ts) are a tie
  * ASOF semantics leave undefined; here the window order ends on the
  * value column, so the GREATEST value wins — a fixed, documented rule
  * instead of whichever row the shuffle happened to deliver last.
  */
object AsOf {

  /** For each `left` row: all left columns + `valueCol` from the latest
    * `right` row with `right.ts <= left.ts` and equal `key` (null when no
    * prior right row exists — left-join semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, valueCol: String): DataFrame =
    asofImpl(left, right, key, ts, valueCol, forward = false)

  /** Forward variant: `valueCol` from the EARLIEST `right` row with
    * `right.ts >= left.ts` (nearest following; null when none). Same
    * one-shuffle union-window plan, time order reversed. Right rows tied
    * on (key, ts): the smallest value wins (fixed, documented rule).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      key: String, ts: String, valueCol: String): DataFrame =
    asofImpl(left, right, key, ts, valueCol, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
      key: String, ts: String, valueCol: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val taggedRight = right
      .select(col(key), col(ts), col(valueCol))
      .withColumn("__side", lit(0))
      .withColumnRenamed(valueCol, "__v")
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // Frame order: time toward the current row (ascending for prior,
    // descending for following); right (__side 0) sorts before left at
    // equal ts so an exactly-simultaneous right row is visible. The
    // final __v key makes the winner among tied right rows deterministic
    // — last() in frame order picks the greatest (backward) / smallest
    // (forward) value.
    val ord =
      if (forward) Seq(col(ts).desc, col("__side"), col("__v").desc)
      else Seq(col(ts), col("__side"), col("__v"))
    val w = Window.partitionBy(col(key))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn(valueCol, last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col).toSeq :+ col(valueCol): _*)
  }
}
