package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomsSpec extends SparkSpec {
  import spark.implicits._

  test("every inserted value probes true (no false negatives)") {
    val members = (1L to 2000L).toDF("v")
    val bloom = Blooms.buildBytes(members, col("v"), expectedItems = 2000).get
    assert(members.filter(Blooms.mightContain(bloom, col("v"))).count() === 2000)
  }

  test("false-positive rate on absent values stays near the configured fpp") {
    val members = (1L to 2000L).toDF("v")
    val bloom = Blooms.buildBytes(members, col("v"), expectedItems = 2000, fpp = 0.01).get
    val absent = (1000001L to 1010000L).toDF("v")
    val fp = absent.filter(Blooms.mightContain(bloom, col("v"))).count()
    // 10k absent probes at 1% nominal fpp; 5x slack keeps this non-flaky
    assert(fp <= 500, s"false-positive count $fp out of 10000")
  }

  test("string values probe through the same xxhash64 pairing") {
    val members = Seq("alpha", "beta", "gamma").toDF("s")
    val bloom = Blooms.buildBytes(members, col("s"), expectedItems = 100).get
    val probed = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("s")
      .withColumn("hit", Blooms.mightContain(bloom, col("s")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed("alpha") && probed("beta") && probed("gamma"))
    // 2 absent probes vs a 100-item-sized bloom: fp chance ~1e-4 each
    assert(!probed("delta") && !probed("epsilon"))
  }

  test("optimalNumBits grows with items and shrinks with looser fpp") {
    assert(Blooms.optimalNumBits(1000000, 0.01) > Blooms.optimalNumBits(1000, 0.01))
    assert(Blooms.optimalNumBits(1000000, 0.1) < Blooms.optimalNumBits(1000000, 0.01))
    // ~9.6 bits/item at 1%
    val bits = Blooms.optimalNumBits(1000000, 0.01)
    assert(bits > 9L * 1000000 && bits < 10L * 1000000)
  }
}
