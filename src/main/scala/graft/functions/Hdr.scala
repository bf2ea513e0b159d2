package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HDR-histogram-style quantile sketch over non-negative integer values
  * (e.g. exact money cents), with a guaranteed relative error bound and
  * — unlike t-digest / DDSketch-with-libm — fully integer-exact,
  * cross-engine-reproducible bucket math.
  *
  * Bucketing (subBits = m, P = 2^m):
  *  - v < P            → bucket = v (exact; one bucket per value)
  *  - v ≥ P, e=⌊log2 v⌋ → bucket = (e-m+1)·P + j where j = the m mantissa
  *    bits below the leading bit: j = (v >> (e-m)) & (P-1)
  *
  * Bucket [lb, ub) has ub/lb = 1 + 1/(P+j) ≤ 1 + 2^-m, so reporting the
  * bucket's LOWER BOUND for the value at any rank gives
  * `lb ≤ x ≤ lb·(1 + 2^-m)` — a ≤2^-m relative error, like DDSketch's
  * γ-bucket guarantee (Masson et al., VLDB 2019) but with e derived from
  * the binary length of the integer (`length(bin(v))-1`) instead of a
  * transcendental log, so Spark and DuckDB (and any engine with `bin`)
  * compute bit-identical buckets — the sketch ESTIMATE itself is
  * hash-comparable across engines, not just a bound check.
  *
  * Scale shape: per group the state is ≤ P·(64-m)+P bucket counts
  * (practically a few hundred), built by a codegen'd two-phase hash
  * aggregation with map-side partial combine — the 100 TB replacement
  * for exact per-group sorts. [[HdrSketch]] packages the same math as a
  * mergeable typed aggregator (one sketch row per group, shard-mergeable).
  */
object Hdr {

  /** Spark SQL text of the bucket index for value expression `v`. */
  def bucketSqlSpark(v: String, m: Int): String =
    bucketSql(v, m, spark = true)

  /** DuckDB text of the same bucket index (same structure, `>>`/`&`
    * operators instead of Spark's `shiftright`).
    */
  def bucketSqlDuck(v: String, m: Int): String =
    bucketSql(v, m, spark = false)

  private def bucketSql(v: String, m: Int, spark: Boolean): String = {
    val p = 1L << m
    val e = s"(length(bin($v)) - 1)"
    val shifted =
      if (spark) s"shiftright($v, $e - $m)" else s"($v >> ($e - $m))"
    // domain guard mirroring bucketOf's require: a negative value must
    // FAIL, not silently take the v < P branch and emit a garbage
    // "bucket" that lowerBoundSql then misinterprets
    val raise =
      if (spark) "cast(raise_error('Hdr bucket: negative value') as bigint)"
      else "CAST(error('Hdr bucket: negative value') AS BIGINT)"
    s"(CASE WHEN $v < 0 THEN $raise WHEN $v < $p THEN $v ELSE (($e - ${m - 1}) * $p) + ($shifted & ${p - 1}) END)"
  }

  /** Spark SQL text of a bucket's lower bound, from bucket expression `b`. */
  def lowerBoundSqlSpark(b: String, m: Int): String =
    lowerBoundSql(b, m, spark = true)

  /** DuckDB text of the same lower bound. */
  def lowerBoundSqlDuck(b: String, m: Int): String =
    lowerBoundSql(b, m, spark = false)

  private def lowerBoundSql(b: String, m: Int, spark: Boolean): String = {
    val p = 1L << m
    val j = s"($b & ${p - 1})"
    val sh =
      if (spark) s"shiftleft($p + $j, ($b div $p) - 1)"
      else s"(($p + $j) << (($b // $p) - 1))"
    s"(CASE WHEN $b < $p THEN $b ELSE $sh END)"
  }

  /** JVM twin of [[bucketSqlSpark]] (used by [[HdrSketch]] and specs). */
  def bucketOf(v: Long, m: Int): Long = {
    require(v >= 0, s"Hdr buckets need non-negative values, got $v")
    val p = 1L << m
    if (v < p) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - m + 1).toLong << m) + ((v >> (e - m)) & (p - 1))
    }
  }

  /** JVM twin of [[lowerBoundSqlSpark]]. */
  def lowerBoundOf(b: Long, m: Int): Long = {
    val p = 1L << m
    if (b < p) b else (p + (b & (p - 1))) << ((b >> m) - 1).toInt
  }

  /** Rank-r (1-based, r = ⌈q·n⌉) quantile lower-bound estimates from a
    * bucket→count histogram — the JVM extraction twin of the plan built
    * by [[quantileEstimates]].
    */
  def quantilesOf(hist: Map[Long, Long], m: Int, qs: Seq[(Long, Long)]): Seq[Long] = {
    val sorted = hist.toSeq.sortBy(_._1)
    val n = sorted.map(_._2).sum
    qs.map { case (num, den) =>
      val r = (n * num + den - 1) / den
      var cum = 0L
      var ans = -1L
      val it = sorted.iterator
      while (ans < 0 && it.hasNext) {
        val (b, c) = it.next(); cum += c
        if (cum >= r) ans = lowerBoundOf(b, m)
      }
      ans
    }
  }

  /** Distributed per-group quantile estimates: one codegen'd two-phase
    * aggregation to bucket counts (map-side combine bounds the shuffle at
    * O(tasks × buckets-per-group)), then a window over the ≤ few-hundred
    * bucket rows of each group. Ranks use exact integer ceil
    * (`(n·num + den - 1) div den`), never FP.
    *
    * @param qs (numerator, denominator, outputAlias) per requested quantile
    * @param weightCol optional non-negative INTEGER row weight — buckets
    *   then accumulate weight instead of count and ranks run over total
    *   weight (weighted quantiles, e.g. "token-weighted p50 doc length");
    *   integer weights keep every rank computation exact
    */
  def quantileEstimates(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      m: Int,
      qs: Seq[(Long, Long, String)],
      weightCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val wProj = weightCol.map(w => col(w).cast("long").as("hdr_w")).toSeq
    val aggExpr = weightCol
      .map(_ => sum(col("hdr_w")))
      .getOrElse(count(lit(1)))
    val counts = df
      .select(gcols ++ Seq(expr(bucketSqlSpark(valueCol, m)).as("hdr_b")) ++ wProj: _*)
      .groupBy(gcols :+ col("hdr_b"): _*)
      .agg(aggExpr.as("hdr_c"))
    val wOrd = Window.partitionBy(gcols: _*).orderBy("hdr_b")
    val wAll = Window.partitionBy(gcols: _*)
    val lb = expr(lowerBoundSqlSpark("hdr_b", m))
    val cum = counts
      .withColumn("hdr_cum", sum("hdr_c").over(wOrd))
      .withColumn("hdr_n", sum("hdr_c").over(wAll))
    val estCols = qs.map { case (num, den, alias) =>
      min(when(col("hdr_cum") >= expr(s"(hdr_n * $num + ${den - 1}) div $den"), lb))
        .as(alias)
    }
    cum
      .groupBy(gcols: _*)
      .agg(max("hdr_n").as("n"), estCols: _*)
  }
}

/** Mergeable sketch state as a typed aggregator: one bucket→count map per
  * group, built with partial aggregation, shard-mergeable by summing
  * counts (associative + commutative), finished as a bucket-sorted
  * [bucket, count, bucket, count, …] array. Pair with
  * [[Hdr.quantilesOf]] to extract estimates — HdrSpec asserts the
  * aggregator path, the plan path ([[Hdr.quantileEstimates]]) and the
  * error bound against exact `percentile()` all agree.
  */
class HdrSketch(m: Int) extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], v: Long): Map[Long, Long] = {
    val b = Hdr.bucketOf(v, m)
    buf.updated(b, buf.getOrElse(b, 0L) + 1L)
  }

  override def merge(b1: Map[Long, Long], b2: Map[Long, Long]): Map[Long, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (b, c)) =>
      acc.updated(b, acc.getOrElse(b, 0L) + c)
    }
  }

  override def finish(reduction: Map[Long, Long]): Seq[Long] =
    reduction.toSeq.sortBy(_._1).flatMap { case (b, c) => Seq(b, c) }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object HdrSketch {
  def apply(m: Int): HdrSketch = new HdrSketch(m)
}
