package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange

import graft.SparkSpec

/** Bucketed tables must make the equi-join shuffle-free. */
class BucketedSpec extends SparkSpec {

  test("co-located join of bucketed tables has no Exchange in the plan") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try {
      val a = (1 to 1000).map(i => (i.toLong % 100, s"a$i")).toDF("k", "va")
      val b = (1 to 500).map(i => (i.toLong % 100, i * 1.5)).toDF("k", "vb")
      Bucketed.writeBucketed(a, "bucketed_a", "k", 8)
      Bucketed.writeBucketed(b, "bucketed_b", "k", 8)
      val j = Bucketed.colocatedJoin(spark, "bucketed_a", "bucketed_b", "k", "k")
      assert(j.count() === 1000L * 5) // each of 100 keys: 10 × 5 matches
      val exchanges = j.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, found: $exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
