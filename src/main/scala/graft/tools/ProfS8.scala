package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfS8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Registry.registerSql(spark)
    graft.Tables.documents(spark, "/root/testdata/sf0.1").createOrReplaceTempView("documents")
    def time(tag: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm", "SELECT doc_id FROM documents")
    time("curl", "SELECT doc_id, canonical_url(concat('HTTP://WWW.Site', cast(doc_id % 7 as string), '.Example.COM:80/p/', cast(doc_id % 5 as string), '/?utm_source=x&id=', cast(doc_id % 9 as string), '#f')) AS c FROM documents")
    time("simhash", "SELECT doc_id, simhash16(text) AS s FROM documents")
    time("minhash", "SELECT doc_id, minhash_sig(text, '0') AS h FROM documents")
    time("qlog2", "SELECT doc_id, qlog2_fp20(doc_id + 1) AS q FROM documents")
    val t0 = System.nanoTime(); graft.SparkEntry.queries("s8_sql_curation")(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save(); println(f"all: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
