package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off stage breakdown for dedup_allpairs_cosine (optimization round
  * 17): times each materialization and the candidate join separately so
  * the optimization targets the stage that actually costs. Mirrors the
  * CURRENT Dedup.allPairsCosine stages (dictionary-encoded ids, PPJoin
  * probe prefix, positional filter).
  * Usage: runMain graft.tools.ProfAllpairs <sfDir>
  */
object ProfAllpairs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val df = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 5000)
      val toks = t("toks (shingle distinct ckpt)") {
        val x = Dedup.shingleRows(df, "doc_id", "text").distinct().localCheckpoint()
        x.count(); x
      }
      val tokIds = t("tokIds (dict join ckpt)") {
        val dict = toks.groupBy("sh").agg(count(lit(1)).as("df"))
          .withColumn("tid", monotonically_increasing_id())
        val x = toks.join(dict, "sh")
          .select(col("doc_id"), col("tid"), col("df"), col("sh"))
          .localCheckpoint()
        x.count(); x
      }
      val packed = t("packed (collect_list ckpt)") {
        val x = tokIds.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("tid"))).as("__toks"),
            count(lit(1)).as("nd")).localCheckpoint()
        x.count(); x
      }
      val sizes = packed.select(col("doc_id"), col("nd"))
      val ranked = t("ranked (rank ckpt)") {
        val x = tokIds.join(sizes, "doc_id")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
          .select(col("doc_id"), col("tid"), col("nd"), col("rk"))
          .localCheckpoint()
        x.count(); x
      }
      val (num2, den2) = (81L, 100L)
      val pref = ranked.filter(col("rk") <=
        col("nd") - expr("(nd * 9 + 9) div 10") + 1)
      val bPref = ranked.filter(col("rk") <=
        col("nd") - expr(s"(nd * $num2 + ${den2 - 1}) div $den2") + 1)
      val a = pref.select(col("doc_id").as("id_a"), col("tid"),
        col("nd").as("na"), col("rk").as("ra"))
      val b = bPref.select(col("doc_id").as("id_b"), col("tid"),
        col("nd").as("nb"), col("rk").as("rb"))
      val u = least(col("na") - col("ra"), col("nb") - col("rb")) + 1
      val cand = t("cand join+posfilter+distinct") {
        val x = a.join(b, "tid")
          .filter(col("na") < col("nb") ||
            (col("na") === col("nb") && col("id_a") < col("id_b")))
          .filter(col("na") * den2 >= col("nb") * num2)
          .filter(u * u * den2 >= col("na") * col("nb") * num2)
          .select("id_a", "id_b").distinct().localCheckpoint()
        println(s"[prof] n_cand=${x.count()}")
        x
      }
      t("verify joins") {
        cand
          .join(packed.select(col("doc_id").as("id_a"),
            col("__toks").as("__ta"), col("nd").as("na")), "id_a")
          .join(packed.select(col("doc_id").as("id_b"),
            col("__toks").as("__tb"), col("nd").as("nb")), "id_b")
          .withColumn("shared",
            size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
          .filter(col("shared") * col("shared") * den2 >= col("na") * col("nb") * num2)
          .write.format("noop").mode("overwrite").save()
      }
      t("full query (catalog)") {
        graft.SparkEntry.queries("dedup_allpairs_cosine")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
