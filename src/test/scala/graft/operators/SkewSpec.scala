package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted two-phase aggregation ≡ direct aggregation. */
class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // key 0 is hot: 5000 rows; keys 1-49 have 20 each
    ((1 to 5000).map(i => (0L, i.toDouble)) ++
      (1 to 49).flatMap(k => (1 to 20).map(i => (k.toLong, i.toDouble))))
      .toDF("k", "v")
  }

  test("saltedSumCount equals plain groupBy sum/count") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === direct.keySet)
    // v values are small integers → FP sums exact regardless of order
    assert(salted === direct)
  }

  test("saltedDistinctCount equals countDistinct") {
    val direct = skewed.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedDistinctCount(skewed, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === direct)
  }

  test("saltedDistinctCount ignores NULLs like COUNT(DISTINCT)") {
    import spark.implicits._
    val withNulls = Seq(
      (1L, Some(1.0)), (1L, Some(2.0)), (1L, None), (1L, None),
      (2L, None)) // key 2 has only nulls → 0 distinct
      .toDF("k", "v")
    val direct = withNulls.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedDistinctCount(withNulls, "k", "v", salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // nulls don't count toward the distinct total (SQL semantics)...
    assert(salted(1L) === 2L && direct(1L) === 2L)
    // ...and a key whose values are ALL null has no rows left to group —
    // it yields no output row (vs COUNT(DISTINCT)'s 0 row). Documented gap.
    assert(direct(2L) === 0L && !salted.contains(2L))
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val small = (0 to 49).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val direct = skewed.join(small, "k").count()
    val salted = Skew.saltedJoin(skewed, small, "k", salts = 8).count()
    assert(salted === direct)
  }

  test("adaptiveSumCount equals plain groupBy, whatever the probe routes") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    // hotShare 0.5: only key 0 (5000 of 5980 rows) routes to the salted path
    val split = Skew.adaptiveSumCount(skewed, "k", "v",
        salts = 8, capacity = 8, hotShare = 0.5)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(split === direct)
    // hotShare 0.99: NO key qualifies — everything takes the cold path
    val allCold = Skew.adaptiveSumCount(skewed, "k", "v",
        salts = 8, capacity = 8, hotShare = 0.99)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(allCold === direct)
  }

  test("adaptiveSumCount keeps the NULL-key group (cold path)") {
    import spark.implicits._
    val withNulls = Seq((Some(1L), 1.0), (Some(1L), 2.0), (None, 5.0), (None, 7.0))
      .toDF("k", "v")
    val out = Skew.adaptiveSumCount(withNulls, "k", "v",
        salts = 4, capacity = 4, hotShare = 0.4)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        (r.getDouble(1), r.getLong(2)))).toMap
    assert(out === Map(1L -> ((3.0, 2L)), -1L -> ((12.0, 2L))))
  }

  test("saltedJoin tolerates map-typed columns (hash() rejects MapType)") {
    import spark.implicits._
    // Spark's hash() fails analysis on MapType (HASH_MAP_TYPE) — the
    // content salt must skip map columns instead of dying on the schema.
    val big = skewed.withColumn("props", map(lit("a"), col("v")))
    val small = (0 to 49).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val out = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(out.count() === skewed.join(small, "k").count())
    assert(out.columns.contains("props"))
  }

  test("saltedJoin spreads byte-identical duplicate rows across salts") {
    import spark.implicits._
    // A hot key of REPEATED IDENTICAL rows: a purely content-derived salt
    // would assign all 4000 copies one salt value (one reducer). With the
    // partition id in the hash, copies spread across source partitions.
    val dup = spark.range(4000).select(lit(0L).as("k"), lit(1.0).as("v"))
      .repartition(8)
    val small = Seq((0L, "dim0")).toDF("k", "name")
    val out = Skew.saltedJoin(dup, small, "k", salts = 8)
    assert(out.count() === 4000)
    // (countDistinct over the raw expression is rejected — nondeterministic
    // inputs can't sit under an aggregate; project it out first)
    val spread = dup.select(Skew.contentSalt(dup, 8).as("s"))
      .distinct().count()
    assert(spread > 1, s"identical rows collapsed to $spread salt(s)")
  }
}
