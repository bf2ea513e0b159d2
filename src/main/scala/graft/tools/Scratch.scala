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
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM baseline: raw md5 throughput
    time("jvm 120k md5") {
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to 120000).foreach(i => md.digest(s"shingle $i words here".getBytes))
    }

    // Spark job fixed cost
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    time("lineitem count warm0") { li.count() }
    time("lineitem count warm1") { li.count() }
    time("lineitem count warm2") { li.count() }

    // synthetic window+groupBy at the same row count as shingleRows
    import org.apache.spark.sql.expressions.Window
    val syn = spark.range(30000)
      .select((col("id") / 60).cast("long").as("doc"), col("id").as("pos"),
        concat(lit("w"), col("id") % 997).as("w"))
    val synSig = syn
      .withColumn("nxt", lead("w", 1).over(Window.partitionBy("doc").orderBy("pos")))
      .filter(col("nxt").isNotNull)
      .select(col("doc"), concat_ws(" ", col("w"), col("nxt")).as("sh"))
      .groupBy("doc")
      .agg(min(md5(concat(lit("0"), col("sh")))).as("h0"),
        min(md5(concat(lit("1"), col("sh")))).as("h1"),
        min(md5(concat(lit("2"), col("sh")))).as("h2"),
        min(md5(concat(lit("3"), col("sh")))).as("h3"))
    time("synthetic sig count run1") { synSig.count() }
    time("synthetic sig count run2") { synSig.count() }

    // real one
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 4)
    time("real sig count run1") { sig.count() }
    time("real sig count run2") { sig.count() }
    spark.stop()
  }
}
