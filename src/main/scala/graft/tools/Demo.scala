package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.api.Engine
import graft.ingest.TweetIngest

/** End-to-end demo of the Twitter-side engine surface: synthesize a raw
  * capture → ingest → Engine facade → search/user/keyword queries.
  * Usage: runMain graft.tools.Demo
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def user(id: String, name: String, followers: Int): String =
      s"""{"id": $id, "id_str": "$id", "name": "$name", "screen_name": "sn_$name", "verified": false, "followers_count": $followers, "friends_count": 5, "created_at": "Wed Mar 25 14:17:28 +0000 2020"}"""
    def status(id: String, text: String, uid: String, uname: String, followers: Int = 10, extra: String = ""): String =
      s"""{"id": $id, "id_str": "$id", "text": "$text", "created_at": "Sun Apr 12 16:48:01 +0000 2020", "lang": "en", "favorite_count": ${id.toInt % 7}, "retweet_count": ${id.toInt % 5}, "entities": {"hashtags": [{"text": "corona", "indices": [0,6]}]}, "user": ${user(uid, uname, followers)}$extra}"""

    val dir = Files.createTempDirectory("demo_raw").toString
    val originals = (1 to 20).map(i => status((1000 + i).toString, s"original tweet $i about topic${i % 3} house", (500 + i % 5).toString, s"u${i % 5}", 100 * (i % 5)))
    val retweets = (1 to 10).map(i => status((2000 + i).toString, s"RT @u${i % 5}: original tweet $i", (600 + i).toString, s"r$i",
      extra = s""", "retweeted_status": ${status((1000 + i).toString, s"original tweet $i about topic${i % 3} house", (500 + i % 5).toString, s"u${i % 5}")}"""))
    val junk = Seq("""{"delete": {"status": {"id": 1}}}""", "garbage {{{")
    Files.write(Paths.get(dir, "capture.json"),
      (originals ++ retweets ++ junk).mkString("\n").getBytes("UTF-8"))

    val (tOut, uOut) = (dir + "/tweets", dir + "/users")
    val (nT, nU) = TweetIngest.run(spark, dir + "/capture.json", tOut, uOut)
    println(s"[demo] ingested tweets=$nT users=$nU")

    val engine = new Engine(spark, tOut, uOut)
    val hits = engine.searchTweets(keyword = Some("house"), limit = 5)
    println(s"[demo] search 'house' -> ${hits.size} rows; first=" +
      hits.headOption.map(r => r.getAs[String]("id_str") + "/" + r.getAs[String]("author_screen_name")))
    val hits2 = engine.searchTweets(keyword = Some("house"), limit = 5)
    println(s"[demo] cache hits=${engine.cache.hits.get()} (expect 1), same=${hits == hits2}")
    println(s"[demo] top users: " + engine.topUsersByFollowers(3).map(_.getAs[String]("screen_name")).mkString(","))
    println(s"[demo] user tweets sn_u1: " + engine.tweetsForUser("sn_u1").size)
    println(s"[demo] top keywords: " + engine.topKeywords(5).map(_.getString(0)).mkString(","))
    spark.stop()
  }
}
