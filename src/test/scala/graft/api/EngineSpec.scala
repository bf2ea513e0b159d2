package graft.api

import graft.{SparkSpec, TestFixtures}

/** Engine facade: tables + cache wiring (≈ TwitterSearchApp surface). */
class EngineSpec extends SparkSpec {

  private lazy val paths: (String, String) = {
    import spark.implicits._
    val tPath = tmpDir("engtweets")
    val uPath = tmpDir("engusers")
    TestFixtures.tweets.toDF().write.mode("overwrite").parquet(tPath)
    TestFixtures.users.toDF().write.mode("overwrite").parquet(uPath)
    (tPath, uPath)
  }

  private lazy val engine: Engine = new Engine(spark, paths._1, paths._2, cacheSize = 8)

  test("searchTweets returns enriched rows and memoizes") {
    val r1 = engine.searchTweets(keyword = Some("house"))
    assert(r1.size === 2)
    val misses = engine.cache.misses.get()
    val r2 = engine.searchTweets(keyword = Some("house"))
    assert(r2 === r1)
    assert(engine.cache.misses.get() === misses) // served from cache
  }

  test("user surfaces work end-to-end") {
    assert(engine.userByScreenName("alice").size === 1)
    assert(engine.tweetsForUser("bob").size === 2)
    assert(engine.topUsersByFollowers(2).head.getAs[String]("screen_name") === "bob")
    assert(engine.topTweetsByFavorites(1).head.getAs[String]("id_str") === "5")
  }

  test("topKeywords warm-up surface") {
    val kws = engine.topKeywords(3).map(_.getString(0))
    assert(kws.contains("house"))
  }

  test("cache checkpoint writes state and keys restore in LRU order") {
    val p = tmpDir("engckpt") + "/state"
    engine.searchTweets(keyword = Some("casa"))
    engine.checkpointCache(p)
    assert(spark.read.parquet(p).count() >= 1)
    val keys = engine.cache.checkpointedKeys(spark, p)
    assert(keys.nonEmpty && keys.exists(_.contains("kw=casa")))
  }

  test("cache restore after restart serves search hits without recompute") {
    val p = tmpDir("engrestore") + "/state"
    val r1 = engine.searchTweets(keyword = Some("house"))
    engine.checkpointCache(p)
    // "restarted" engine over the same tables, fresh empty cache
    val engine2 = new Engine(spark, paths._1, paths._2, cacheSize = 8)
    assert(engine2.restoreCache(p) >= 1)
    val misses = engine2.cache.misses.get()
    val r2 = engine2.searchTweets(keyword = Some("house"))
    assert(engine2.cache.misses.get() === misses, "restored cache must serve the hit")
    assert(r2.map(_.getAs[String]("id_str")).sorted === r1.map(_.getAs[String]("id_str")).sorted)
  }

  test("sql surface exposes the curated tables as views") {
    val rows = engine.sql(
      "SELECT t.id_str, u.screen_name FROM tweets t JOIN users u ON t.user_id = u.id " +
        "WHERE t.text RLIKE '(?i)house' ORDER BY t.id_str").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("2", "5"))
  }
}
