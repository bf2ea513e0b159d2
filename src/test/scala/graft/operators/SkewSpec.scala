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

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val small = (0 to 49).map(k => (k.toLong, s"dim$k")).toDF("k", "name")
    val direct = skewed.join(small, "k").count()
    val salted = Skew.saltedJoin(skewed, small, "k", salts = 8).count()
    assert(salted === direct)
  }
}
