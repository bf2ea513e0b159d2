package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the Twitter data model (FIXTURES.md).
  *
  * Derived from the reference's observed shapes: raw Twitter v1.1 status
  * JSON (sample in /root/reference/DataProcessing.ipynb cell 10), the
  * curated tweet document (cell 19), and the MySQL `users_info` DDL
  * (cell 32). Ids are kept as `id_str: String` everywhere — tweet ids
  * exceed 2^53 and must never round-trip through doubles (SURVEY §7.4).
  */
object TwitterSchemas {

  val entitiesSchema: StructType = StructType(Seq(
    StructField("hashtags", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("indices", ArrayType(LongType)))))),
    StructField("symbols", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("indices", ArrayType(LongType)))))),
    StructField("urls", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("expanded_url", StringType),
      StructField("display_url", StringType),
      StructField("indices", ArrayType(LongType)))))),
    StructField("user_mentions", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("id_str", StringType),
      StructField("name", StringType),
      StructField("screen_name", StringType),
      StructField("indices", ArrayType(LongType))))))))

  val rawUserSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("id_str", StringType),
    StructField("name", StringType), StructField("screen_name", StringType),
    StructField("location", StringType), StructField("description", StringType),
    StructField("verified", BooleanType),
    StructField("followers_count", LongType), StructField("friends_count", LongType),
    StructField("listed_count", LongType), StructField("favourites_count", LongType),
    StructField("statuses_count", LongType),
    StructField("created_at", StringType)))

  private def statusCore: Seq[StructField] = Seq(
    StructField("id", LongType), StructField("id_str", StringType),
    StructField("text", StringType),
    StructField("created_at", StringType),
    StructField("lang", StringType),
    StructField("favorited", BooleanType), StructField("retweeted", BooleanType),
    StructField("favorite_count", LongType), StructField("retweet_count", LongType),
    StructField("quote_count", LongType), StructField("reply_count", LongType),
    StructField("is_quote_status", BooleanType),
    StructField("possibly_sensitive", BooleanType),
    StructField("filter_level", StringType), StructField("source", StringType),
    StructField("truncated", BooleanType),
    StructField("entities", entitiesSchema),
    StructField("user", rawUserSchema))

  /** One raw streaming-API status line (ingest input, SURVEY §1.1 S1). */
  val rawTweetSchema: StructType = StructType(
    statusCore ++ Seq(
      StructField("retweeted_status", StructType(statusCore :+
        StructField("quoted_status", StructType(statusCore)))),
      StructField("quoted_status", StructType(statusCore)),
      StructField("_corrupt", StringType)))

  /** Per-status projection of the curated doc (FIXTURES.md §2, c16 P1/P2). */
  val tweetProj: Seq[StructField] = Seq(
    StructField("_id", StringType),
    StructField("id_str", StringType),
    StructField("user_id", StringType),
    StructField("text", StringType),
    StructField("created_at", StringType),
    StructField("lang", StringType),
    StructField("favorite_count", LongType), StructField("retweet_count", LongType),
    StructField("quote_count", LongType), StructField("reply_count", LongType),
    StructField("entities", entitiesSchema))

  /** Curated tweet table (≈ Mongo `tweets_test` document, cell 19). */
  val curatedTweetSchema: StructType = StructType(
    tweetProj ++ Seq(
      StructField("is_quote_status", BooleanType),
      StructField("quoted_status", StructType(tweetProj)),
      StructField("retweets", ArrayType(StructType(tweetProj)))))

  /** Users table (≈ MySQL `users_info`, cell 32 DDL). */
  val userSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("screen_name", StringType),
    StructField("location", StringType),
    StructField("description", StringType),
    StructField("verified", BooleanType),
    StructField("followers_count", LongType),
    StructField("friends_count", LongType),
    StructField("created_at", TimestampType)))

  /** Twitter's created_at format ("Sun Apr 12 16:48:01 +0000 2020"; the
    * reference parses it with "%a %b %d %H:%M:%S %z %Y", app.py:33).
    *
    * Spark 4's datetime parser rejects 'E' (day-of-week) letters in parse
    * patterns, so [[parseTwitterTime]] skips the fixed-width "EEE " prefix
    * and parses the remainder.
    */
  val TwitterTimeFormat = "MMM dd HH:mm:ss xx yyyy"

  def parseTwitterTime(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.to_timestamp(
      org.apache.spark.sql.functions.substring(c, 5, 26), TwitterTimeFormat)
}
