package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * All variants key off `md5(key)` rather than an RNG: the sample is a
  * pure function of the row (reproducible across runs, engines, cluster
  * sizes, and partitionings — `df.sample()` is none of those), sampling
  * joins/unions of sampled tables stay consistent (the same key is kept
  * everywhere), and the decision is a map-side column predicate that
  * pushes work to the scan. This is the standard trick for carving
  * reproducible held-out sets from a 100 TB corpus.
  *
  * The uniformity assumption is md5 avalanche: the first 8 hex digits of
  * `md5(key)` are uniform on [0, 2^32) for any key distribution.
  */
object Sampling {

  /** 8-hex-digit threshold for a rate in [0,1]: keep iff
    * `substr(md5(key),1,8) < threshold`. Hex-string comparison ==
    * numeric comparison (fixed width, lowercase hex in both Spark and
    * DuckDB).
    */
  private[graft] def rateToHex(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    // Any rounded threshold ≥ 2^32 must keep EVERY row: "g" sorts above
    // any hex digit, so `prefix < "g"` is identically true. This covers
    // rate == 1.0 AND computed rates in [1 - 2^-33, 1.0) — those round
    // to 0x100000000, which %08x would format as the 9-char "100000000",
    // silently keeping only '0'-prefixed hashes (~6% of rows).
    val rounded = math.round(rate * (1L << 32))
    if (rounded >= (1L << 32)) "g" else f"$rounded%08x"
  }

  private def hashPrefix(keyCol: Column): Column =
    substring(md5(keyCol.cast("string")), 1, 8)

  /** Deterministic Bernoulli sample at `rate`. */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashPrefix(col(keyCol)) < lit(rateToHex(rate)))

  /** Exact-k per-stratum sample: the k rows with the smallest hash in
    * each stratum (deterministic; ties impossible — the row key is the
    * final sort key). One shuffle on the stratum key; per-stratum state
    * is a bounded top-k, not the stratum's row set.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String, k: Int): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(col(strataCol))
          .orderBy(md5(col(keyCol).cast("string")), col(keyCol))))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** Leakage-free train/val/test split: the split is a function of the
    * GROUP id (e.g. the duplicate-cluster id from
    * [[Components.clusters]]), so near-duplicate documents land in the
    * SAME split — splitting by document id leaks paraphrases of training
    * docs into the test set. `fractions` must sum to 1; assignment is the
    * usual md5 threshold on cumulative boundaries (deterministic,
    * engine-portable, no shuffle beyond whatever produced the group
    * column).
    */
  def splitByGroup(df: DataFrame, groupCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val prefix = hashPrefix(col(groupCol))
    // last split is the else-branch (threshold 1.0 exactly)
    val split = fractions.init.zip(cum.init).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), cumRate)) =>
        when(prefix < lit(rateToHex(cumRate)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** Domain-mixture sample: per-source keep rates (e.g. downsample web
    * crawl, keep all of wikipedia) with a default for unlisted sources.
    * The rate lookup is a literal CASE expression — no join, no
    * broadcast, fully pushable.
    */
  def mixture(df: DataFrame, srcCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val thr = rates.foldLeft(lit(rateToHex(defaultRate))) { case (acc, (src, r)) =>
      when(col(srcCol) === src, lit(rateToHex(r))).otherwise(acc)
    }
    df.filter(hashPrefix(col(keyCol)) < thr)
  }
}
