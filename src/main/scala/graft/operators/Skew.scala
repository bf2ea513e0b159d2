package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation (100 TB posture).
  *
  * A plain `groupBy(key).agg(...)` sends every row of a hot key to one
  * reducer. Salted two-phase aggregation splits each key into `salts`
  * sub-keys for the partial phase, then merges partials — bounding any
  * single task at ~1/salts of the hottest key. Works for algebraic
  * aggregates (sum/count/min/max); AQE's skew handling covers joins,
  * this covers aggregation.
  */
object Skew {

  /** Deterministic salts, two flavors. A `monotonically_increasing_id()`
    * salt varies when a lost partition is recomputed (the id depends on
    * task/partition layout), so a retry could double-count a row into
    * one partial and drop it from another mid-shuffle.
    *
    * [[partitionSalt]] — `pmod(hash(key, spark_partition_id()), salts)`:
    * stable under task retry (a recomputed partition keeps its id and
    * rows), reads NO extra columns (hashing every column would drag the
    * full row through an otherwise-pruned scan — measured 1.6× on the
    * two-column salted agg), and spreads a hot key's per-partition
    * partials across reducers — which is the level salting acts on
    * anyway: map-side partial aggregation already collapses a
    * partition's rows per (key, salt) before the exchange.
    *
    * [[contentSalt]] — `pmod(hash(hashable columns, partition id), salts)`:
    * row-content derived, used by [[saltedJoin]], where the output
    * carries every column regardless so there is no pruning to lose.
    * Map-typed columns are EXCLUDED from the hash: Spark's `hash()`
    * rejects MapType at analysis (HASH_MAP_TYPE — map equality is
    * order-ambiguous), so hashing every column blindly fails on
    * map-bearing schemas. The partition id joins the hash so
    * byte-identical duplicate rows spread across (at least) their source
    * partitions — a content-only salt would send a hot key made of
    * repeated identical rows to ONE reducer. Join-salt values never
    * affect the join's OUTPUT (the small side replicates to every salt),
    * so a retry recomputing a partition under a different id cannot
    * change the result — determinism only matters for the AGG salt,
    * which is why [[saltedSumCount]] uses [[partitionSalt]] on the key.
    */
  private def partitionSalt(key: String, salts: Int): Column =
    pmod(hash(col(key), spark_partition_id()), lit(salts))

  private[operators] def contentSalt(df: DataFrame, salts: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = df.schema.fields
      .filter(f => !hasMap(f.dataType))
      .map(f => col(f.name))
    pmod(hash(hashable.toSeq :+ spark_partition_id(): _*), lit(salts))
  }

  /** Two-phase salted sum/count over `valueCol` grouped by `key`.
    * Equivalent to `groupBy(key).agg(sum(value), count(*))` (asserted in
    * SkewSpec), but no reducer sees more than ~1/salts of a hot key.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", partitionSalt(key, salts))
    val partial = salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_" + valueCol),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Adaptive skew-aware sum/count: ONE bounded Misra-Gries probe
    * ([[graft.functions.FreqItems]]) finds the hot keys, then a SINGLE
    * scan of `df` aggregates through a conditional salt — hot keys take
    * `partitionSalt` (spreading each across `salts` reducer sub-keys),
    * cold keys take salt 0 (map-side partial aggregation collapses them
    * per key exactly as a plain groupBy would, so the constant salt
    * costs nothing). The result equals `groupBy(key).agg(sum, count)`
    * exactly. This is the composition the heavy-hitters sketch exists
    * for: a full groupBy to FIND the skew would itself suffer the skew,
    * but the MG probe is one map-side pass of O(capacity) state per
    * partition — probe + routed agg read the fact table twice in total
    * (the old hot-filter/cold-filter union read it three times).
    *
    * The probe's driver-side result is ≤ `capacity` entries (a bounded
    * model, like IVF's centroid table — not a data collect). Routing is
    * correct whichever keys the probe selects: the salt only splits the
    * partial phase of the same algebraic aggregate, so a borderline key
    * drifting between hot and cold across runs changes the PLAN, never
    * the answer — and because the answer is computed by the ONE
    * post-probe scan, that holds even for a nondeterministic `df`
    * (e.g. rand()-derived columns): a probe that saw different rows can
    * only pick a different salt split. `hotShare` is the minimum
    * fraction of all rows a key must (provably, via MG's lower-bound
    * estimate) hold to be salted; keys above n/(capacity+1) are
    * guaranteed present in the probe, so pick capacity ≥ 1/hotShare to
    * never miss a qualifying key.
    */
  def adaptiveSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16, capacity: Int = 16, hotShare: Double = 0.1): DataFrame = {
    require(hotShare > 0 && hotShare <= 1, s"hotShare ($hotShare) outside (0,1]")
    val mg = udaf(graft.functions.FreqItems(capacity))
    val keyStr = col(key).cast("string")
    val probe = df.agg(count(lit(1)).as("n"), mg(keyStr).as("m")).head()
    val n = probe.getLong(0)
    val hot = probe.getMap[String, Long](1).iterator
      .collect { case (k, est) if est >= n * hotShare => k }
      .toSeq.sorted
    val salt =
      if (hot.isEmpty) lit(0)
      else when(keyStr.isin(hot: _*), partitionSalt(key, salts)).otherwise(lit(0))
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_" + valueCol),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted distinct-count: exact, two-phase. Phase 1 dedups (key, value)
    * within salt partitions; phase 2 dedups across salts then counts.
    * NULL values are ignored, matching SQL `COUNT(DISTINCT value)`.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df.select(col(key), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .dropDuplicates(key, valueCol, "__salt") // partial dedup, salt-local
      .dropDuplicates(key, valueCol)
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_distinct_" + valueCol))

  /** Broadcast-salt pattern for a skewed join key: replicate the small
    * side `salts` times so the big side's salted keys all find a match.
    * bigSide gains `__salt` ∈ [0, salts); smallSide is exploded per salt.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt", contentSalt(big, salts))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }
}
