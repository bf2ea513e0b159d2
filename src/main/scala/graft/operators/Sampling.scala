package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact-k per-stratum sample: the k rows with the smallest md5 hash in
    * each stratum (deterministic; ties impossible in practice — distinct
    * keys collide on full md5 only adversarially, and (hash, key) breaks
    * even that).
    *
    * Scale shape: a bounded [[graft.functions.MinK]] aggregator — O(k)
    * state per stratum, partial (map-side) aggregation before the one
    * exchange on the stratum key — then a broadcast semi-join of the
    * winner keys back onto the source rows. A
    * `row_number().over(partitionBy(stratum))` window would instead
    * externally sort the FULL stratum in a single task (with few strata —
    * the realistic case — that task sorts terabytes at 100 TB scale).
    *
    * Preconditions: `keyCol` is unique within its stratum (it is the
    * sampling key). Rows with a NULL `keyCol` are never sampled: they are
    * filtered before the aggregation (a null sampling key has no hash
    * order) and could not match the equality semi-join anyway.
    *
    * `broadcastWinners` controls the join back onto the source: the
    * default broadcasts the winner set (|strata| × k rows) — right
    * whenever the sample is meant to be handled downstream as "the small
    * sample". Pass `false` when stratifying into millions of cells; the
    * semi-join then shuffles both sides on (stratum, key), which AQE may
    * still convert to broadcast if the winners turn out small.
    */
  def stratified(df: DataFrame, strataCol: String, keyCol: String, k: Int,
      broadcastWinners: Boolean = true): DataFrame = {
    val minK = udaf(graft.functions.MinK(k))
    val winners = df
      .filter(col(keyCol).isNotNull)
      .select(col(strataCol).as("__s"),
        md5(col(keyCol).cast("string")).as("__h"),
        col(keyCol).cast("string").as("__k"))
      .groupBy("__s")
      .agg(minK(col("__h"), col("__k")).as("__w"))
      .select(col("__s"), explode(col("__w")).as("__x"))
      .select(col("__s"), col("__x.k").as("__wk"))
    val w = if (broadcastWinners) broadcast(winners) else winners
    df.join(w,
      col(strataCol) === col("__s") && col(keyCol).cast("string") === col("__wk"),
      "left_semi")
  }

  /** Per-row WEIGHTED (importance) sample: row i is kept with its own
    * probability `weightCol` ∈ [0,1] (values clamped), decided by the
    * same md5-threshold trick as [[bernoulli]] but with a per-row
    * threshold — the standard quality-weighted keep of training-data
    * curation (keep high-quality docs with p≈1, downweight boilerplate).
    * Deterministic per (key, weight): reproducible across runs, engines,
    * and partitionings, and monotone in the weight — raising a row's
    * weight can only add it to the sample, never drop it (the nested-
    * samples property that makes curation sweeps comparable).
    *
    * The threshold is built with floor (not round: HALF_UP vs HALF_EVEN
    * differs between engines on exact .5 products) and stays a pure
    * map-side column predicate — no shuffle, pushes to the scan.
    * NULL or NaN weights drop the row — unknown quality means not
    * sampled. NaN is mapped to NULL explicitly BEFORE clamping: Spark's
    * least/greatest order NaN above every double, so a bare
    * `least(greatest(w, 0), 1)` would clamp NaN to 1.0 and keep the row.
    */
  def weighted(df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val raw = col(weightCol).cast("double")
    val w = when(isnan(raw), lit(null).cast("double"))
      .otherwise(least(greatest(raw, lit(0.0)), lit(1.0)))
    // floor(w·2^32) as an 8-hex threshold, guarded on the FLOORED LONG
    // (mirroring rateToHex's rounded >= 2^32 guard): for w in
    // [1 - 2^-33, 1.0) the double product w·2^32 rounds to exactly 2^32,
    // whose hex is the 9-char "100000000" — lpad(..., 8) would TRUNCATE
    // it to "10000000" and silently keep ~6% of rows. Any floored value
    // reaching 2^32 must keep every row ("g" sorts above all hex).
    val thr32 = floor(w * pow(lit(2.0), lit(32))).cast("long")
    val thr = when(thr32 >= (1L << 32), lit("g"))
      .otherwise(lower(lpad(hex(thr32), 8, "0")))
    df.filter(hashPrefix(col(keyCol)) < thr)
  }

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

  /** Temperature-scaled source mixing at α = 1/2 (the multilingual-LM
    * standard — mT5/XLM-R flatten the source distribution by sampling
    * p_i ∝ n_i^α so head sources stop dominating without starving the
    * tail): computes per-source target counts from the CORPUS ITSELF
    * (unlike [[mixture]], whose rates are caller-given) and keeps each
    * source's deterministic hash-first `target_i` rows.
    *
    * All-integer and engine-exact: weights are ⌊√n_i⌋ (IEEE sqrt is
    * correctly rounded, floor makes it an integer — no order-dependent
    * float sums anywhere), targets are `(B·w_i) div Σw` with budget
    * B = ⌊N/2⌋, and selection is md5-rank ≤ target (reproducible across
    * runs/engines/partitionings, monotone in the budget). A small
    * source's target may exceed its row count — then the whole source
    * is kept (the rank predicate saturates; true α<1 mixing would
    * up-sample such sources by repetition, which a keep-flag operator
    * deliberately does not do).
    *
    * Scale shape: one map-side-combined count per source (|sources|
    * rows — broadcast), targets derived from a 1-row total, selection
    * via a per-source md5-ordered rank. The rank window is the honest
    * cost at 100 TB — a sort within each source's partitions, the same
    * shape the stratified sampler and w2_topk_per_group already carry;
    * a threshold-probe variant (binary-search the md5 prefix to the
    * target quantile) trades exactness for sortlessness if a source's
    * row count makes the sort the bottleneck.
    */
  def temperatureMix(df: DataFrame, srcCol: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = df.groupBy(srcCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    // distinct names from cnt's __n/__w: Spark resolution is
    // case-insensitive by default, so __N would collide with __n
    val tot = cnt.agg(sum("__n").as("__tn"), sum("__w").as("__tw"))
    val targets = cnt.crossJoin(broadcast(tot))
      .select(col(srcCol),
        expr("((__tn div 2) * __w) div __tw").as("__target"))
    val rk = row_number().over(
      Window.partitionBy(srcCol).orderBy(hashPrefix(col(keyCol)), col(keyCol)))
    df.join(broadcast(targets), srcCol)
      .withColumn("__rk", rk)
      .withColumn("kept", col("__rk") <= col("__target"))
      .drop("__rk", "__target")
  }
}
