package graft.cache

import graft.SparkSpec

/** LRU + TTL semantics (reference cache.py:48-126, quirks fixed). */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) = (1 to n).toDF("x")

  test("getOrElse memoizes: second probe is a hit, no recompute") {
    val cache = new ResultCache(maxSize = 4)
    var computes = 0
    def run = { computes += 1; df(3) }
    val a = cache.getOrElse("t", Seq("k" -> "1"))(run)
    val b = cache.getOrElse("t", Seq("k" -> "1"))(run)
    assert(a === b && computes === 1)
    assert(cache.hits.get() === 1 && cache.misses.get() === 1)
  }

  test("key is the full normalized param tuple (order-insensitive)") {
    val cache = new ResultCache(maxSize = 4)
    cache.getOrElse("t", Seq("a" -> "1", "b" -> "2"))(df(1))
    assert(cache.get("t", Seq("b" -> "2", "a" -> "1")).isDefined)
    assert(cache.get("t", Seq("a" -> "1", "b" -> "3")).isEmpty)
    assert(cache.get("u", Seq("a" -> "1", "b" -> "2")).isEmpty) // namespace isolation
  }

  test("LRU evicts the least-recently-used entry at capacity") {
    val cache = new ResultCache(maxSize = 2)
    cache.put("t", Seq("k" -> "1"), df(1))
    cache.put("t", Seq("k" -> "2"), df(1))
    cache.get("t", Seq("k" -> "1")) // touch 1 → 2 becomes LRU
    cache.put("t", Seq("k" -> "3"), df(1)) // evicts 2
    assert(cache.get("t", Seq("k" -> "1")).isDefined)
    assert(cache.get("t", Seq("k" -> "2")).isEmpty)
    assert(cache.get("t", Seq("k" -> "3")).isDefined)
  }

  test("TTL expires entries using the injected clock") {
    var now = 1000L
    val cache = new ResultCache(maxSize = 4, ttlSeconds = 10, clock = () => now)
    cache.put("t", Seq("k" -> "1"), df(1))
    now += 5000
    assert(cache.get("t", Seq("k" -> "1")).isDefined)
    now += 6000 // 11s total
    assert(cache.get("t", Seq("k" -> "1")).isEmpty)
  }

  test("checkpoint persists entry metadata to parquet") {
    val cache = new ResultCache(maxSize = 4)
    cache.put("t", Seq("k" -> "1"), df(5))
    val path = tmpDir("cacheckpt") + "/state"
    cache.checkpoint(spark, path)
    val state = spark.read.parquet(path).collect()
    assert(state.length === 1 && state.head.getAs[Long]("n_rows") === 5L)
  }

  test("restore rebuilds payloads: restart serves hits without recompute") {
    import org.apache.spark.sql.functions._
    val cache = new ResultCache(maxSize = 4)
    // heterogeneous schemas across entries, incl. an empty result
    cache.put("t", Seq("k" -> "1"), df(5))
    cache.put("u", Seq("q" -> "x"),
      df(3).select(col("x"), concat(lit("v"), col("x")).as("s")))
    cache.put("t", Seq("k" -> "empty"), df(3).filter(col("x") > 99))
    val path = tmpDir("cacherestore") + "/state"
    cache.checkpoint(spark, path)

    val fresh = new ResultCache(maxSize = 4) // "restarted process"
    assert(fresh.restore(spark, path) === 3)
    var computes = 0
    val rows = fresh.getOrElse("u", Seq("q" -> "x")) { computes += 1; df(1) }
    assert(computes === 0, "restored entry must serve without recompute")
    assert(rows.map(r => (r.getAs[Int]("x"), r.getAs[String]("s"))).sorted
      === Seq((1, "v1"), (2, "v2"), (3, "v3")))
    assert(fresh.get("t", Seq("k" -> "1")).get.map(_.getInt(0)).sorted === Seq(1, 2, 3, 4, 5))
    assert(fresh.get("t", Seq("k" -> "empty")).get.isEmpty)
    assert(fresh.hits.get() === 3 && fresh.misses.get() === 0)
  }

  test("restore respects capacity and keeps the newest entries") {
    val cache = new ResultCache(maxSize = 4)
    var now = 1000L
    val stamped = new ResultCache(maxSize = 4, clock = () => { now += 1000; now })
    (1 to 4).foreach(i => stamped.put("t", Seq("k" -> i.toString), df(i)))
    val path = tmpDir("cachecap") + "/state"
    stamped.checkpoint(spark, path)
    val small = new ResultCache(maxSize = 2)
    assert(small.restore(spark, path) === 2)
    // entries restored oldest-first into an LRU map → the 2 newest survive
    assert(small.get("t", Seq("k" -> "3")).isDefined)
    assert(small.get("t", Seq("k" -> "4")).isDefined)
  }
}
