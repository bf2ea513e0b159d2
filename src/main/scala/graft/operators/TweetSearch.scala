package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interactive tweet search (SURVEY §3.1) as one declarative plan.
  *
  * The reference's results page (app.py:106-191 → cache.py:70-162) builds a
  * Mongo filter, server-sorts, client-truncates at 50, then does N+1 MySQL
  * lookups per rendered row. Here: filter → multi-key top-k (fused by
  * Catalyst into TakeOrderedAndProject — no full sort materialization) →
  * one broadcast hash join to users.
  */
object TweetSearch {

  val DefaultLimit = 50
  val PageSize     = 10

  /** Core search: top-k tweets matching the accreted predicate, sorted by
    * (retweet_count, favorite_count) DESC — the cache path's key order
    * (cache.py:153; the direct path T1 uses a different order and a
    * lexicographic created_at sort, documented quirk SURVEY §7.4#4).
    */
  def search(
      tweets: DataFrame,
      keyword: Option[String] = None,
      hashtags: Seq[String] = Nil,
      lang: Option[String] = None,
      dateRange: Option[(String, String)] = None,
      limit: Int = DefaultLimit): DataFrame =
    tweets
      .filter(Predicates.searchPredicate(keyword, hashtags, lang, dateRange))
      .orderBy(col("retweet_count").desc, col("favorite_count").desc, col("id_str"))
      .limit(limit)

  /** Search + author enrichment: one broadcast join replaces the
    * reference's per-row memoized MySQL point reads (J1, app.py:205).
    */
  def searchWithAuthors(
      tweets: DataFrame,
      users: DataFrame,
      keyword: Option[String] = None,
      hashtags: Seq[String] = Nil,
      lang: Option[String] = None,
      dateRange: Option[(String, String)] = None,
      limit: Int = DefaultLimit): DataFrame =
    search(tweets, keyword, hashtags, lang, dateRange, limit)
      .join(broadcast(users.select(
        col("id").as("author_id"),
        col("name").as("author_name"),
        col("screen_name").as("author_screen_name"),
        col("followers_count").as("author_followers"))),
        col("user_id") === col("author_id"), "left")
      .drop("author_id")

  /** Pagination (T6/§2.5): slice page `page` (1-based) of an ordered
    * result. The reference slices a collected list driver-side
    * (app.py:200-201). Engine-side: sort + OFFSET + LIMIT — Spark plans
    * this as a distributed top-(offset+limit) (TakeOrderedAndProject with
    * offset), so only `pageNum * pageSize` rows ever reach one task. A
    * global row_number window here would move the WHOLE result to a single
    * task — the round-1 scale-killer, regression-locked in PlanSpec.
    */
  def page(ordered: DataFrame, pageNum: Int, pageSize: Int = PageSize): DataFrame =
    ordered
      .orderBy(col("retweet_count").desc, col("favorite_count").desc, col("id_str"))
      .offset((pageNum - 1) * pageSize)
      .limit(pageSize)

  /** T5: display cap — render at most `cap` retweets per tweet (the
    * reference slices `retweets[:30]` at render time, app.py:245-247).
    * Null retweet arrays (originals with no retweets) stay null.
    */
  def withDisplayCap(tweets: DataFrame, cap: Int = 30): DataFrame =
    tweets.withColumn("retweets",
      when(col("retweets").isNotNull, slice(col("retweets"), 1, cap)))

  /** T4 sidebar: top-5 tweets by favorites (app.py:170-171). */
  def topTweetsByFavorites(tweets: DataFrame, k: Int = 5): DataFrame =
    tweets.orderBy(col("favorite_count").desc, col("id_str")).limit(k)

  /** §2.7: UNION ALL of a keyword search and a hashtag search — the
    * reference concatenates both result lists (app.py:141-144), duplicates
    * retained for parity.
    */
  def unionSearch(tweets: DataFrame, keyword: String, hashtags: Seq[String],
      lang: Option[String] = None, limit: Int = DefaultLimit): DataFrame =
    search(tweets, Some(keyword), Nil, lang, None, limit)
      .unionByName(search(tweets, None, hashtags, lang, None, limit))
}
