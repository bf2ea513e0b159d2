package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** One-off column-set bisection for the text_quality sf10 anomaly
  * (round 11): same signals as the catalog query, one variant per
  * signal subset, each noop-sunk and timed min-of-2.
  * Usage: runMain graft.tools.ProfileTQ <sfDir>
  */
object ProfileTQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = graft.Tables.documents(spark, sfDir)
    def toks = size(split(lower(col("text")), " ")).cast("long")
    def punct = size(regexp_extract_all(lower(col("text")),
      lit("[^a-z0-9 ]"), lit(0))).cast("long")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full" -> (() => docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"),
        (punct.cast("double") / length(col("text"))).as("punct_ratio"),
        (length(col("text")).cast("double") / toks).as("chars_per_token"))
        .orderBy("doc_id")),
      "no_sort" -> (() => docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"),
        (punct.cast("double") / length(col("text"))).as("punct_ratio"),
        (length(col("text")).cast("double") / toks).as("chars_per_token"))),
      "no_stopword" -> (() => docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        (punct.cast("double") / length(col("text"))).as("punct_ratio"),
        (length(col("text")).cast("double") / toks).as("chars_per_token"))
        .orderBy("doc_id")),
      "no_punct" -> (() => docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"),
        (length(col("text")).cast("double") / toks).as("chars_per_token"))
        .orderBy("doc_id")),
      "stopword_only" -> (() => docs.select(
        col("doc_id"),
        (Text.stopwordHits(col("text")).cast("double") / toks).as("stopword_ratio"))
        .orderBy("doc_id")),
      "punct_only" -> (() => docs.select(
        col("doc_id"),
        (punct.cast("double") / length(col("text"))).as("punct_ratio"))
        .orderBy("doc_id")),
      "counts_only" -> (() => docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        (length(col("text")).cast("double") / toks).as("chars_per_token"))
        .orderBy("doc_id")))

    variants.foreach { case (name, mk) =>
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tq] $name%-14s min=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
