package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles at scale, without Spark's `percentile()` buffer.
  *
  * Spark's exact `Percentile` expression buffers a counts-map of every
  * distinct value PER GROUP inside a single aggregation buffer — with a
  * high-cardinality value column that is O(distinct-values-per-group)
  * heap in ONE task, an OOM at 100 TB, not a slowdown. Two scale-safe
  * exact plans replace it:
  *
  *  - [[fromHistogram]] — when the distinct-value DOMAIN is small
  *    (enum codes, integer quantities ≤ a few thousand): cumulative
  *    rank over the (group, value) histogram.
  *  - [[exactRefined]] — the general plan (money-as-cents has ~10⁷
  *    possible values and near-unique actuals, so the histogram
  *    degenerates to the table): classic two-pass refinement. Pass 1
  *    counts rows per COARSE monotone bucket — map-side combine
  *    collapses each partition to ≤ |buckets| rows, so the shuffle is
  *    tiny however large the fact table — and a per-group cumulative
  *    over the few-hundred-row bucket table locates the bucket(s)
  *    holding the target ranks. Pass 2 rescans only rows in those
  *    buckets (~n/|buckets| of the data), ranks them within-bucket in
  *    parallel (window keyed by (group, bucket), never by group
  *    alone), offsets by the bucket's cumulative-below, and picks the
  *    crossing values. No stage sorts more than a sliver of one
  *    group; both passes are map-heavy scans.
  *
  * Both reproduce Spark's `Percentile.getPercentile` bit-for-bit: with
  * 0-indexed position `pos = (n−1)·q`, the result is the value at rank
  * `⌊pos⌋+1` when `⌈pos⌉ = ⌊pos⌋`, else
  * `(⌈pos⌉−pos)·lo + (pos−⌊pos⌋)·hi` — the same weighted-sum IEEE
  * expression tree, so results are hash-identical to the
  * `percentile()` plans they replace (and to DuckDB's `quantile_cont`,
  * the a10/a20 oracle twins — type-7, proven cross-engine since r2).
  */
object Percentiles {

  /** Default coarse bucket for fixed-point money: integer cents,
    * arithmetic-shifted 16 bits — ~65536 cents (= $655.36) per bucket,
    * monotone (floor and `>>` both are), ≤ ~170 buckets for prices up
    * to $110k. Any monotone non-decreasing Column→Column works.
    */
  def centsBucket(v: Column): Column =
    shiftright(floor(v * 100 + lit(0.5)).cast("long"), 16)

  /** The (groups…, value, cnt) histogram that [[fromHistogram]]
    * consumes. NULL values are dropped, matching `percentile()`.
    */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Exact type-7 percentiles from a (groups…, valueCol, cntCol)
    * histogram: one output row per group, one column per requested
    * (quantile, outputName) pair. Right when |domain| is genuinely
    * small; for near-unique values use [[exactRefined]].
    */
  def fromHistogram(hist: DataFrame, groupCols: Seq[String], valueCol: String,
      cntCol: String, quantiles: Seq[(Double, String)]): DataFrame = {
    checkQuantiles(quantiles)
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ranked = hist
      .withColumn("__cnt", col(cntCol))
      .withColumn("__cum", sum(col(cntCol)).over(byGroup.orderBy(col(valueCol))))
      .withColumn("__n", sum(col(cntCol)).over(byGroup))
    pickAndInterpolate(ranked, groupCols, valueCol, quantiles)
  }

  /** Exact type-7 percentiles over an UNBOUNDED (or merely huge) value
    * domain: two-pass coarse-bucket refinement (see object doc).
    *
    * `bucket` must be monotone non-decreasing in the value and yield a
    * bounded number of distinct buckets (default: $655.36 money
    * buckets). `broadcastTargets` controls how the ≤2·|quantiles|
    * target buckets per group rejoin the fact table: broadcast for
    * few-group aggregations (the default), shuffle join when the group
    * count itself is huge — same knob as Sampling's broadcastWinners.
    *
    * PRECONDITION (scale): the per-bucket DISTINCT-value count must be
    * bounded. Pass 2 first collapses the target bucket to its
    * (value, cnt) histogram, then ranks that histogram in one window
    * task per (group, bucket) — so the task holds distinct values, not
    * rows. Pick a bucket aligned to the value's quantization:
    * [[centsBucket]] over money yields ≤ 65,536 distinct cents per
    * bucket no matter how many ROWS share the bucket (why the current
    * callers are safe at any scale). Over an arbitrary CONTINUOUS
    * double domain, distinct-per-bucket degenerates to
    * rows-per-bucket and pass 2 becomes the single-task window this
    * operator exists to avoid — narrow the bucket (more buckets, same
    * tiny pass-1 shuffle) or quantize the value first so the histogram
    * stays bounded.
    */
  def exactRefined(df: DataFrame, groupCols: Seq[String], valueCol: String,
      quantiles: Seq[(Double, String)],
      bucket: Column => Column = centsBucket,
      broadcastTargets: Boolean = true): DataFrame = {
    checkQuantiles(quantiles)
    val g = groupCols.map(col)
    val rows = df
      .select(g :+ col(valueCol): _*)
      .filter(col(valueCol).isNotNull)
      .withColumn("__b", bucket(col(valueCol)))
    // Pass 1: per-bucket counts (map-side combine → tiny shuffle), then
    // a per-group cumulative over the small bucket table. A bucket
    // covers sorted 1-indexed ranks (__below, __below + __bcnt].
    val byGroup = Window.partitionBy(g: _*)
    val bcum = rows
      .groupBy(g :+ col("__b"): _*).agg(count(lit(1)).as("__bcnt"))
      .withColumn("__bcum", sum(col("__bcnt")).over(byGroup.orderBy(col("__b"))))
      .withColumn("__n", sum(col("__bcnt")).over(byGroup))
      .withColumn("__below", col("__bcum") - col("__bcnt"))
    // Buckets holding any bracketing rank ⌊pos⌋+1 / ⌈pos⌉+1 (the pair
    // can straddle two adjacent buckets).
    val needed = quantiles
      .flatMap { case (q, _) =>
        val pos = (col("__n") - 1) * lit(q)
        Seq(floor(pos) + 1, ceil(pos) + 1)
      }
      .map(rank => rank > col("__below") && rank <= col("__bcum"))
      .reduce(_ || _)
    val targets0 = bcum.filter(needed)
      .select(g ++ Seq(col("__b"), col("__below"), col("__n")): _*)
    val targets = if (broadcastTargets) broadcast(targets0) else targets0
    // Pass 2: only rows in target buckets survive the rescan
    // (~n/|buckets| per group); rank within (group, bucket) in
    // parallel and offset by the bucket's cumulative-below.
    val refined = rows.join(targets, groupCols :+ "__b")
      .groupBy(g ++ Seq(col("__b"), col("__below"), col("__n"), col(valueCol)): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", col("__below") + sum(col("__cnt"))
        .over(Window.partitionBy(g :+ col("__b"): _*).orderBy(col(valueCol))))
    pickAndInterpolate(refined, groupCols, valueCol, quantiles)
  }

  private def checkQuantiles(quantiles: Seq[(Double, String)]): Unit = {
    require(quantiles.nonEmpty, "at least one (quantile, name) required")
    quantiles.foreach { case (q, n) =>
      require(q >= 0 && q <= 1, s"quantile $q ($n) outside [0,1]")
    }
  }

  /** Shared tail: `ranked` carries groupCols, valueCol and 1-indexed
    * global rank intervals (__cum − __cnt, __cum] plus the group total
    * __n; pick the values bracketing each quantile position and
    * type-7-interpolate with Spark `Percentile`'s exact IEEE tree.
    */
  private def pickAndInterpolate(ranked: DataFrame, groupCols: Seq[String],
      valueCol: String, quantiles: Seq[(Double, String)]): DataFrame = {
    def valueAt(rank: Column): Column =
      max(when(col("__cum") >= rank && (col("__cum") - col("__cnt")) < rank,
        col(valueCol)))
    val aggs = max(col("__n")).as("__n") +:
      quantiles.zipWithIndex.flatMap { case ((q, _), i) =>
        val pos = (col("__n") - 1) * lit(q)
        Seq(valueAt(floor(pos) + 1).as(s"__lo_$i"),
          valueAt(ceil(pos) + 1).as(s"__hi_$i"))
      }
    val outCols = quantiles.zipWithIndex.map { case ((q, name), i) =>
      val pos = (col("__n") - 1) * lit(q)
      val lo = col(s"__lo_$i")
      val hi = col(s"__hi_$i")
      when(ceil(pos) === floor(pos), lo)
        .otherwise((ceil(pos) - pos) * lo + (pos - floor(pos)) * hi)
        .as(name)
    }
    ranked.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++ outCols: _*)
  }
}
