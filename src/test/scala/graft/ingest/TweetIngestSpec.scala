package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Ingest pipeline spec over a synthesized raw-JSONL fixture shaped like
  * the reference's capture (FIXTURES.md §1): originals, retweets (text
  * "RT …" + retweeted_status), a quote tweet, duplicate lines, and
  * malformed/non-status lines that the tolerant scan must skip.
  */
class TweetIngestSpec extends SparkSpec {

  private def user(id: String, name: String, followers: Int = 10): String =
    s"""{"id": $id, "id_str": "$id", "name": "$name", "screen_name": "sn_$name",
        "location": "loc", "description": "d", "verified": false,
        "followers_count": $followers, "friends_count": 5,
        "created_at": "Wed Mar 25 14:17:28 +0000 2020"}""".replaceAll("\n\\s*", " ")

  private def status(id: String, text: String, uid: String, uname: String,
      extra: String = ""): String =
    s"""{"id": $id, "id_str": "$id", "text": "$text",
        "created_at": "Sun Apr 12 16:48:01 +0000 2020", "lang": "en",
        "favorite_count": 3, "retweet_count": 2, "quote_count": 0,
        "reply_count": 1, "is_quote_status": false,
        "entities": {"hashtags": [{"text": "corona", "indices": [0, 6]}]},
        "user": ${user(uid, uname)}$extra}""".replaceAll("\n\\s*", " ")

  private lazy val rawPath: String = {
    val dir = tmpDir("rawtweets")
    val og = status("1001", "original tweet about corona", "501", "alice")
    val og2 = status("1002", "second original", "502", "bob")
    val quoted = status("1005", "quoted content", "505", "erin")
    val quote = status("1003", "quoting something", "503", "carol",
      s""", "quoted_status": $quoted""").replace("\"is_quote_status\": false", "\"is_quote_status\": true")
    val rt1 = status("2001", "RT @alice: original tweet about corona", "504", "dave",
      s""", "retweeted_status": ${status("1001", "original tweet about corona", "501", "alice")}""")
    val rt2 = status("2002", "RT @alice: original tweet about corona", "506", "frank",
      s""", "retweeted_status": ${status("1001", "original tweet about corona", "501", "alice")}""")
    val lines = Seq(
      og, og2, quote, rt1, rt2,
      og, // duplicate line → dedup must collapse
      """{"delete": {"status": {"id": 99}}}""", // non-status control message
      """not json at all {{{""") // malformed
    Files.write(Paths.get(dir, "part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("tolerant scan keeps only well-formed status lines") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    assert(raw.count() === 6) // 5 distinct + 1 duplicate line
  }

  test("canonical tweets: dedup by id_str, retweets fold into parent") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    val tweets = TweetIngest.withRetweets(TweetIngest.canonicalTweets(raw), raw)
    // originals: 1001 (also arriving via 2 retweet lines), 1002, 1003
    assert(tweets.count() === 3)
    val t1001 = tweets.filter(tweets("id_str") === "1001").collect().head
    val rts = t1001.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("retweets")
    assert(rts.map(_.getAs[String]("id_str")).sorted === Seq("2001", "2002"))
    // quote preserved as nested struct
    val t1003 = tweets.filter(tweets("id_str") === "1003").collect().head
    assert(t1003.getAs[org.apache.spark.sql.Row]("quoted_status")
      .getAs[String]("id_str") === "1005")
    assert(t1003.getAs[Boolean]("is_quote_status"))
  }

  test("users: authors of tweets, retweets and quotes, deduped, parsed timestamp") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    val us = TweetIngest.users(raw)
    // alice(501, also nested in 2 retweet lines), bob, carol, dave, erin(quoted author), frank
    assert(us.count() === 6)
    val alice = us.filter(us("id") === "501").collect().head
    assert(alice.getAs[String]("screen_name") === "sn_alice")
    val ts = alice.getAs[java.sql.Timestamp]("created_at")
    assert(ts != null && ts.toInstant.toString.startsWith("2020-03-25T14:17:28"))
  }

  test("full run writes lang-partitioned tweets + users parquet") {
    val (tOut, uOut) = (tmpDir("tweets"), tmpDir("users"))
    val (nT, nU) = TweetIngest.run(spark, rawPath, tOut, uOut)
    assert(nT === 3 && nU === 6)
    assert(Files.list(Paths.get(tOut)).toArray.map(_.toString)
      .exists(_.contains("lang=en")))
  }

  test("single-pass curatedTweets equals the two-phase canonical+retweets path") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    val onePass = TweetIngest.curatedTweets(raw)
      .orderBy("id_str").collect().toSeq
    val twoPass = TweetIngest.withRetweets(TweetIngest.canonicalTweets(raw), raw)
      .orderBy("id_str").collect().toSeq
    assert(onePass === twoPass)
  }

  test("duplicate ids carry identical payloads (dedup winner is well-defined)") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    import org.apache.spark.sql.functions._
    val dupPayloads = raw.groupBy("id_str")
      .agg(countDistinct(struct(col("text"), col("lang"), col("user.id_str"))).as("n"))
      .filter(col("n") > 1)
    assert(dupPayloads.count() === 0)
  }

  test("ingest is idempotent: re-reading produces identical id sets") {
    val raw = TweetIngest.readRaw(spark, rawPath)
    val a = TweetIngest.canonicalTweets(raw).select("id_str").collect().map(_.getString(0)).sorted
    val b = TweetIngest.canonicalTweets(TweetIngest.readRaw(spark, rawPath))
      .select("id_str").collect().map(_.getString(0)).sorted
    assert(a === b)
  }
}
