package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic hash-based sampling. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")

  test("bernoulli is deterministic and partitioning-invariant") {
    val a = Sampling.bernoulli(docs, "id", 0.3).select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.bernoulli(docs.repartition(13), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a === b)
  }

  test("bernoulli rate ordering: lower-rate sample is a subset (nested samples)") {
    val s10 = Sampling.bernoulli(docs, "id", 0.1).select("id").collect().map(_.getLong(0)).toSet
    val s50 = Sampling.bernoulli(docs, "id", 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s50))
    // rates land near expectation (md5 uniformity; 3σ ≈ 0.03 at n=2000)
    assert(math.abs(s50.size / 2000.0 - 0.5) < 0.05)
  }

  test("bernoulli edge rates: 1.0 keeps every row, 0.0 keeps none") {
    assert(Sampling.bernoulli(docs, "id", 1.0).count() === 2000)
    assert(Sampling.bernoulli(docs, "id", 0.0).count() === 0)
  }

  test("stratified takes exactly k per stratum, deterministically") {
    val out = Sampling.stratified(docs, "src", "id", 7)
    val perSrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc === Map("src0" -> 7L, "src1" -> 7L, "src2" -> 7L, "src3" -> 7L))
    val again = Sampling.stratified(docs.repartition(7), "src", "id", 7)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      === again.select("id").collect().map(_.getLong(0)).sorted)
  }

  test("stratified equals the row_number reference selection (oracle semantics)") {
    import org.apache.spark.sql.expressions.Window
    // the DuckDB oracle ranks with row_number() OVER (PARTITION BY stratum
    // ORDER BY md5(key), key); the bounded MinK aggregator must select the
    // exact same rows
    val ref = docs.withColumn("rn",
        row_number().over(Window.partitionBy("src")
          .orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("rn") <= 7).drop("rn")
    val out = Sampling.stratified(docs, "src", "id", 7)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      === ref.select("id").collect().map(_.getLong(0)).sorted)
  }

  test("stratified with k larger than the stratum keeps the whole stratum") {
    val out = Sampling.stratified(docs.filter(col("id") <= 10), "src", "id", 100)
    assert(out.count() === 10)
  }

  test("weighted: edge weights, constant-weight equivalence, monotone nesting") {
    val w0 = docs.withColumn("w", lit(0.0))
    val w1 = docs.withColumn("w", lit(1.0))
    assert(Sampling.weighted(w0, "id", "w").count() === 0)
    assert(Sampling.weighted(w1, "id", "w").count() === 2000)
    // constant weight ≡ bernoulli at that rate (0.25·2^32 is exact, so
    // floor vs round cannot differ)
    val wq = docs.withColumn("w", lit(0.25))
    val viaW = Sampling.weighted(wq, "id", "w").select("id")
      .collect().map(_.getLong(0)).toSet
    val viaB = Sampling.bernoulli(docs, "id", 0.25).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(viaW === viaB)
    // monotone: doubling every weight only ADDS rows (nested samples)
    val lo = docs.withColumn("w", (col("id") % 100) / lit(200.0))
    val hi = docs.withColumn("w", (col("id") % 100) / lit(100.0))
    val sLo = Sampling.weighted(lo, "id", "w").select("id")
      .collect().map(_.getLong(0)).toSet
    val sHi = Sampling.weighted(hi, "id", "w").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(sLo.subsetOf(sHi) && sHi.size > sLo.size)
    // out-of-range weights clamp instead of corrupting the hex compare
    val wild = docs.withColumn("w", (col("id") % 3).cast("double") * 5 - 5)
    val got = Sampling.weighted(wild, "id", "w").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got === docs.filter(col("id") % 3 === 2).select("id")
      .collect().map(_.getLong(0)).toSet) // w∈{-5,0,5}→clamp{0,0,1}
  }

  test("weighted: NULL and NaN weights drop the row; near-1.0 weights keep all") {
    // NaN must be mapped out BEFORE clamping: Spark's least/greatest order
    // NaN above every double, so least(greatest(NaN, 0), 1) = 1.0 — a bare
    // clamp would silently keep every NaN-weight row at p=1.
    val mixed = docs.withColumn("w",
      when(col("id") % 3 === 0, lit(Double.NaN))
        .when(col("id") % 3 === 1, lit(null).cast("double"))
        .otherwise(lit(1.0)))
    val kept = Sampling.weighted(mixed, "id", "w").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === (1L to 2000L).filter(_ % 3 === 2).toSet)
    // w = nextDown(1.0): the double product w·2^32 rounds to exactly 2^32,
    // whose 9-char hex lpad(..., 8) would TRUNCATE to '10000000' (keeping
    // ~6% of rows); the floored-long guard must keep EVERY row instead.
    val nearOne = docs.withColumn("w", lit(math.nextDown(1.0)))
    assert(Sampling.weighted(nearOne, "id", "w").count() === 2000)
  }

  test("stratified: NULL sampling keys are never sampled and never NPE") {
    val withNulls = docs.withColumn("key",
      when(col("id") % 5 === 0, lit(null).cast("long")).otherwise(col("id")))
    val out = Sampling.stratified(withNulls, "src", "key", 7)
    assert(out.count() === 28) // 7 per stratum, from non-null keys only
    assert(out.filter(col("key").isNull).count() === 0)
    // selection matches stratifying the null-free subset directly
    val direct = Sampling.stratified(withNulls.filter(col("key").isNotNull),
      "src", "key", 7)
    assert(out.select("id").collect().map(_.getLong(0)).sorted
      === direct.select("id").collect().map(_.getLong(0)).sorted)
  }

  test("stratified without winner broadcast selects the same rows") {
    val hinted = Sampling.stratified(docs, "src", "id", 7)
    val plain = Sampling.stratified(docs, "src", "id", 7, broadcastWinners = false)
    assert(hinted.select("id").collect().map(_.getLong(0)).sorted
      === plain.select("id").collect().map(_.getLong(0)).sorted)
    // the hint really is dropped: no broadcast-hint node in the analyzed plan
    def hasHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(hasHint(hinted) && !hasHint(plain))
  }

  test("mixture applies per-source rates with default") {
    val out = Sampling.mixture(docs, "src", "id",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 500)          // keep all
    assert(!bySrc.contains("src1"))        // drop all
    assert(bySrc("src2") > 175 && bySrc("src2") < 325) // ≈ half of 500
    // mixture ∩ source == bernoulli at that source's rate (same key-hash)
    val mixSrc2 = out.filter(col("src") === "src2").select("id")
      .collect().map(_.getLong(0)).toSet
    val bern = Sampling.bernoulli(docs.filter(col("src") === "src2"), "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(mixSrc2 === bern)
  }

  test("splitByGroup: near-dup cluster members never straddle splits") {
    import spark.implicits._
    // 200 docs in 100 two-doc clusters (cluster id = even anchor)
    val labeled = (1L to 200L).map(i => (i, i - (i % 2))).toDF("id", "cluster_id")
    val split = Sampling.splitByGroup(labeled, "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // both members of every cluster share a split — zero leakage
    val straddlers = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddlers === 0)
    // all three splits materialize and roughly match fractions
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > 120) // ≈160 of 200
  }

  test("splitByGroup rejects fractions that don't sum to 1") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "cluster_id")
    intercept[IllegalArgumentException](
      Sampling.splitByGroup(df, "cluster_id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("temperatureMix: targets follow ⌊√n⌋ weights; selection deterministic") {
    // skewed sources: 1600 / 300 / 100 rows → weights 40 / 17 / 10,
    // budget 1000 → targets 597 / 253 / 149 (integer math, exact)
    val skewed = ((1L to 1600L).map((_, "web")) ++
      (2001L to 2300L).map((_, "wiki")) ++ (3001L to 3100L).map((_, "code")))
      .toDF("id", "src")
    val out = Sampling.temperatureMix(skewed, "src", "id")
      .select("src", "kept").collect()
      .map(r => (r.getString(0), r.getBoolean(1)))
    val keptBySrc = out.groupBy(_._1).view.mapValues(_.count(_._2)).toMap
    assert(keptBySrc("web") === 1000L * 40 / 67)  // 597
    assert(keptBySrc("wiki") === 1000L * 17 / 67) // 253
    // code's target (1000·10/67 = 149) exceeds its 100 rows → the whole
    // source is kept (rank ≤ target saturates; up-sampling by repetition
    // is the α<1 alternative this operator deliberately does not do)
    assert(keptBySrc("code") === 100)
    // the flattening property: head source's keep RATE < tail source's
    assert(keptBySrc("web").toDouble / 1600 < keptBySrc("code").toDouble / 100)
    // deterministic rerun
    val again = Sampling.temperatureMix(skewed, "src", "id")
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureMix(skewed, "src", "id")
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(again === first)
  }

  test("rateToHex boundary encoding") {
    assert(Sampling.rateToHex(0.0) === "00000000")
    assert(Sampling.rateToHex(0.25) === "40000000")
    assert(Sampling.rateToHex(0.5) === "80000000")
    assert(Sampling.rateToHex(1.0) === "g")
    // rates that ROUND to 2^32 must also keep everything — %08x would
    // format 0x100000000 as a 9-char string whose `<` compare silently
    // keeps only '0'-prefixed hashes (~6% of rows)
    assert(Sampling.rateToHex(1.0 - math.pow(2, -34)) === "g")
    assert(Sampling.rateToHex(math.nextDown(1.0)) === "g")
  }
}
