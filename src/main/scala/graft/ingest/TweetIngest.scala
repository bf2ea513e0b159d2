package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.TwitterSchemas._

/** Batch ingest: raw tweet JSONL → curated tweets + users tables.
  *
  * Re-expresses the reference's "approach 3" two-pass dict pipeline
  * (/root/reference/DataProcessing.ipynb cell 16, `get_og_tweets` +
  * `add_retweets`, and cells 30-37 for users) as a single Spark job with
  * two branches off one tolerant JSON scan. The reference's per-row Mongo /
  * MySQL inserts (cells 20/33) become bulk parquet writes.
  *
  * Scale notes (100 TB design):
  *  - one scan feeds both branches — Spark schedules two jobs over the same
  *    source; at cluster scale persist() the classified scan or write it
  *    once as a staging table;
  *  - dedup and retweet assembly shuffle by `id_str` (the only shuffles);
  *  - the curated output is written partitioned by `lang` so the engine's
  *    F3 language filter becomes partition pruning.
  */
object TweetIngest {

  /** S1: tolerant line-JSON scan. Malformed / non-status lines (the
    * reference skips 18,542 of them via except-continue, cell 17 output)
    * surface in `_corrupt` or as all-null rows and are filtered out.
    */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(rawTweetSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .filter(col("_corrupt").isNull && col("id_str").isNotNull)
      .drop("_corrupt")

  /** F8: the reference's retweet classifier — `text.startswith('RT')`
    * (cell 9 et al.), kept verbatim for parity (SURVEY §7.4#5).
    */
  def isRetweet: Column = col("text").startsWith("RT")

  /** P1/P2 projection of one status struct to the curated shape. */
  private def projectStatus(prefix: String): Column = {
    def f(name: String): Column =
      if (prefix.isEmpty) col(name) else col(s"$prefix.$name")
    struct(
      f("id_str").as("_id"),
      f("id_str").as("id_str"),
      f("user.id_str").as("user_id"),
      f("text").as("text"),
      f("created_at").as("created_at"),
      f("lang").as("lang"),
      f("favorite_count").as("favorite_count"),
      f("retweet_count").as("retweet_count"),
      f("quote_count").as("quote_count"),
      f("reply_count").as("reply_count"),
      f("entities").as("entities"))
  }

  /** Pass-1 equivalent: canonical original tweets. A retweet line
    * contributes its `retweeted_status` as the canonical doc; other lines
    * contribute themselves. Dedup by id_str (last-writer-wins in the
    * reference's dict upsert; payloads are identical per id, asserted in
    * the ingest spec, so arbitrary-winner dropDuplicates is equivalent).
    */
  def canonicalTweets(raw: DataFrame): DataFrame = {
    val fromRetweet = raw
      .filter(isRetweet && col("retweeted_status.id_str").isNotNull)
      .select(
        projectStatus("retweeted_status").as("t"),
        col("retweeted_status.is_quote_status").as("is_quote_status"),
        when(col("retweeted_status.quoted_status.id_str").isNotNull,
          projectStatus("retweeted_status.quoted_status")).as("quoted_status"))
    val fromOriginal = raw
      .filter(!isRetweet)
      .select(
        projectStatus("").as("t"),
        col("is_quote_status"),
        when(col("quoted_status.id_str").isNotNull,
          projectStatus("quoted_status")).as("quoted_status"))
    fromRetweet.unionByName(fromOriginal)
      .select(col("t.*"), col("is_quote_status"), col("quoted_status"))
      .dropDuplicates("id_str")
  }

  /** Pass-2 equivalent (J2/A7): retweet records grouped per original and
    * joined onto the canonical rows as `retweets: array<struct>`.
    */
  def withRetweets(canonical: DataFrame, raw: DataFrame): DataFrame = {
    val rts = raw
      .filter(isRetweet && col("retweeted_status.id_str").isNotNull)
      .select(
        col("retweeted_status.id_str").as("og_id"),
        projectStatus("").as("rt"))
      .groupBy("og_id")
      .agg(sort_array(collect_list(col("rt"))).as("retweets"))
    canonical
      .join(rts, canonical("id_str") === rts("og_id"), "left")
      .drop("og_id")
  }

  /** Users branch (cells 30-37): authors of tweets, retweets, and quoted
    * tweets, dedup by id_str, Twitter-format created_at parsed to a real
    * timestamp (cell 33's C1 parse).
    */
  def users(raw: DataFrame): DataFrame = {
    def userStruct(prefix: String): Column = {
      def f(name: String): Column =
        col((if (prefix.isEmpty) "user" else s"$prefix.user") + "." + name)
      struct(
        f("id_str").as("id"),
        f("name").as("name"),
        f("screen_name").as("screen_name"),
        f("location").as("location"),
        f("description").as("description"),
        f("verified").as("verified"),
        f("followers_count").as("followers_count"),
        f("friends_count").as("friends_count"),
        f("created_at").as("created_at_raw"))
    }
    // All four author positions: the line's own user, the retweeted
    // original's user, a top-level quoted status's user, and a quoted
    // status nested inside a retweet (curatedTweets emits quoted docs from
    // that path, so its authors must exist in the users table too —
    // reference add_users collects the same set, cell 34).
    raw
      .select(explode(array(
        userStruct(""),
        userStruct("retweeted_status"),
        userStruct("quoted_status"),
        userStruct("retweeted_status.quoted_status"))).as("u"))
      .filter(col("u.id").isNotNull)
      .select(col("u.*"))
      .withColumn("created_at", parseTwitterTime(col("created_at_raw")))
      .drop("created_at_raw")
      .dropDuplicates("id")
  }

  /** Single-pass curated table: canonical docs + retweet assembly from ONE
    * scan and ONE shuffle. Each raw line contributes (key = original id,
    * canonical candidate, optional retweet record); a single groupBy picks
    * a canonical winner (payloads are identical per id — asserted in the
    * ingest spec — so any winner matches the reference's last-writer-wins
    * dict upsert) and collects the sorted retweet array. Equivalent to
    * `withRetweets(canonicalTweets(raw), raw)` (asserted in the spec), but
    * at 100 TB it halves the scan work and removes a join.
    */
  def curatedTweets(raw: DataFrame): DataFrame = {
    val contrib = raw
      .filter(!isRetweet || col("retweeted_status.id_str").isNotNull)
      .select(
        when(isRetweet, col("retweeted_status.id_str"))
          .otherwise(col("id_str")).as("key"),
        when(isRetweet,
          struct(
            projectStatus("retweeted_status").as("t"),
            col("retweeted_status.is_quote_status").as("is_quote_status"),
            when(col("retweeted_status.quoted_status.id_str").isNotNull,
              projectStatus("retweeted_status.quoted_status")).as("quoted_status")))
          .otherwise(
            struct(
              projectStatus("").as("t"),
              col("is_quote_status"),
              when(col("quoted_status.id_str").isNotNull,
                projectStatus("quoted_status")).as("quoted_status"))).as("canon"),
        when(isRetweet, projectStatus("")).as("rt"))
    contrib
      .groupBy(col("key"))
      .agg(
        min(col("canon")).as("canon"), // deterministic winner (identical payloads)
        sort_array(collect_list(col("rt"))).as("retweets"))
      .select(col("canon.t.*"), col("canon.is_quote_status"),
        col("canon.quoted_status"),
        when(size(col("retweets")) > 0, col("retweets")).as("retweets"))
  }

  /** Full ingest: raw JSONL path → (tweets, users) written as parquet.
    * K1/K2 sinks: bulk columnar writes instead of the reference's 10,984
    * per-row Mongo inserts + 19,232 per-row MySQL inserts.
    */
  def run(spark: SparkSession, rawPath: String, tweetsOut: String, usersOut: String): (Long, Long) = {
    val raw = readRaw(spark, rawPath)
    val tweets = curatedTweets(raw)
    tweets.write.mode("overwrite").partitionBy("lang").parquet(tweetsOut)
    val us = users(raw)
    us.write.mode("overwrite").parquet(usersOut)
    val spark2 = spark
    (spark2.read.parquet(tweetsOut).count(), spark2.read.parquet(usersOut).count())
  }
}
