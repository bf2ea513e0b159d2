package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing experiments (not part of the library surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val words = docs.select(explode(split(lower(col("text")), " ")).as("word"))

    time("explode+count") { words.count() }
    time("explode+count again") { words.count() }
    time("explode+groupBy only") {
      words.groupBy("word").count().orderBy(desc("count")).limit(20).collect()
    }
    time("explode+isin+groupBy") {
      words.filter(!col("word").isin(graft.functions.Text.StopWords: _*))
        .groupBy("word").count().orderBy(desc("count")).limit(20).collect()
    }
    time("explode+rlike+groupBy") {
      words.filter(col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word").count().orderBy(desc("count")).limit(20).collect()
    }
    time("full a1") {
      graft.SparkEntry.queries("a1_word_topk")(spark, "/root/testdata/sf0.1").collect()
    }
    spark.stop()
  }
}
