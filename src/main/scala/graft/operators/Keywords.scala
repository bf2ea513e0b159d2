package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Global keyword analytics (SURVEY §2.4 A1/A2).
  *
  * The reference's `cache_top_10_keywords` (cache.py:220-240) collects every
  * tweet text to the driver and counts in a Python `Counter`. Here:
  * project text → tokenize/filter as column expressions → explode →
  * hash-aggregate (map-side partial + final) → TakeOrderedAndProject.
  * Fully distributed; no driver-side loop.
  */
object Keywords {

  /** Top-k keywords over a text column (default matches the reference's
    * top-10). Tokenization = lowercase whitespace split, alnum-only,
    * stopword drop (C5-C8; NLTK-punkt parity notes in SURVEY §7.4#3).
    */
  def topKeywords(df: DataFrame, textCol: String = "text", k: Int = 10): DataFrame =
    df.select(explode(Text.keywordTokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(k)
}
