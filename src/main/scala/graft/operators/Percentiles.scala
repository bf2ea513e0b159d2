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
    * tiny pass-1 shuffle), quantize the value first so the histogram
    * stays bounded, or chain a second refinement level
    * ([[exactRefinedChain]]) so only a 2⁻³²-of-the-group leaf ever
    * reaches the distinct-value ranking.
    */
  def exactRefined(df: DataFrame, groupCols: Seq[String], valueCol: String,
      quantiles: Seq[(Double, String)],
      bucket: Column => Column = centsBucket,
      broadcastTargets: Boolean = true): DataFrame =
    exactRefinedChain(df, groupCols, valueCol, quantiles, Seq(bucket),
      broadcastTargets)

  /** Fixed-width monotone bucketing for continuous domains:
    * `floor(v / width)`. Chain progressively narrower widths (each level
    * subdivides a parent bucket into `parentWidth / width` children) to
    * drive the leaf population down before the final distinct-value
    * ranking — see [[exactRefinedChain]].
    */
  def widthBucket(width: Double): Column => Column = {
    require(width > 0, s"bucket width ($width) must be > 0")
    v => floor(v / lit(width)).cast("long")
  }

  /** [[exactRefined]] generalized to a CHAIN of progressively finer
    * monotone bucketings — the escape hatch for truly continuous
    * domains, where no single quantization-aligned bucket exists and
    * one level would leave pass 2's per-bucket distinct count unbounded
    * (the documented [[exactRefined]] precondition).
    *
    * Level k histograms only the rows that survived level k−1's target
    * filter, bucketed by `buckets(k)` WITHIN the parent bucket: the
    * per-group cumulative locates the child buckets holding the
    * bracketing ranks, rows outside them are dropped, and the absolute
    * rank offset (`__below`) accumulates down the chain. After the last
    * level, the surviving leaf population is ranked by distinct value
    * exactly as [[exactRefined]]'s pass 2. Each level's shuffle is a
    * bounded histogram (map-side combine) and each level divides the
    * surviving rows by its fan-out, so two 65,536-ary levels subdivide
    * a group 2³²-fold before anything is ranked row-wise — no window
    * task ever holds more than one leaf bucket's distinct values.
    *
    * Correctness needs only that every `buckets(k)` is monotone
    * non-decreasing in the value (the join carries the parent bucket
    * ids, so child ids need not be globally unique); for the SCALE
    * property, make each level strictly finer than the last so the
    * surviving leaf actually shrinks — fixed widths where each width
    * divides its parent's, e.g. `Seq(widthBucket(1024),
    * widthBucket(1))`, do both.
    */
  def exactRefinedChain(df: DataFrame, groupCols: Seq[String], valueCol: String,
      quantiles: Seq[(Double, String)],
      buckets: Seq[Column => Column],
      broadcastTargets: Boolean = true): DataFrame = {
    checkQuantiles(quantiles)
    require(buckets.nonEmpty, "at least one bucketing level required")
    val g = groupCols.map(col)
    // Buckets holding any bracketing rank ⌊pos⌋+1 / ⌈pos⌉+1 (the pair
    // can straddle two adjacent buckets).
    def needed(below: Column, upto: Column): Column = quantiles
      .flatMap { case (q, _) =>
        val pos = (col("__n") - 1) * lit(q)
        Seq(floor(pos) + 1, ceil(pos) + 1)
      }
      .map(rank => rank > below && rank <= upto)
      .reduce(_ || _)
    var rows = df
      .select(g :+ col(valueCol): _*)
      .filter(col(valueCol).isNotNull)
    var region: Seq[String] = Nil // bucket columns fixed so far
    buckets.zipWithIndex.foreach { case (bucket, k) =>
      val b = s"__b$k"
      rows = rows.withColumn(b, bucket(col(valueCol)))
      val part = g ++ region.map(col)
      // Histogram of the surviving rows by this level's bucket (map-side
      // combine → tiny shuffle), cumulated within the parent region. A
      // bucket covers sorted 1-indexed ranks (__below, __below+__bcnt].
      val carried = if (k == 0) Nil else Seq(col("__below"), col("__n"))
      val hist0 = rows
        .groupBy(part ++ carried :+ col(b): _*).agg(count(lit(1)).as("__bcnt"))
        .withColumn("__lcum", sum(col("__bcnt"))
          .over(Window.partitionBy(part: _*).orderBy(col(b))))
      val hist =
        if (k == 0)
          hist0.withColumn("__n", sum(col("__bcnt")).over(Window.partitionBy(part: _*)))
            .withColumn("__cum", col("__lcum"))
        else hist0.withColumn("__cum", col("__below") + col("__lcum"))
      val targets0 = hist
        .filter(needed(col("__cum") - col("__bcnt"), col("__cum")))
        .select(part ++ Seq(col(b), (col("__cum") - col("__bcnt")).as("__below"),
          col("__n")): _*)
      val targets = if (broadcastTargets) broadcast(targets0) else targets0
      // Only rows in target buckets survive into the next level.
      rows = rows.drop("__below", "__n")
        .join(targets, groupCols ++ region :+ b)
      region :+= b
    }
    // Final pass: rank the leaf population by DISTINCT value (one window
    // task per leaf bucket holds values, not rows) and offset by the
    // accumulated below-count.
    val leafPart = g ++ region.map(col)
    val refined = rows
      .groupBy(leafPart ++ Seq(col("__below"), col("__n")) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", col("__below") + sum(col("__cnt"))
        .over(Window.partitionBy(leafPart: _*).orderBy(col(valueCol))))
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
