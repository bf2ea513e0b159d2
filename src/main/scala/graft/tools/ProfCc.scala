package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for the connected-components trio (optimization round
  * 17): times signature build, star-edge generation, and the CC rounds.
  * Usage: runMain graft.tools.ProfCc <sfDir>
  */
object ProfCc {
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
    import graft.operators.{Components, Dedup}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = graft.Tables.documents(spark, sfDir)
      val sig = t("minhash signatures ckpt") {
        val x = Dedup.minhashSignatures(docs, "doc_id", "text", 4).localCheckpoint()
        x.count(); x
      }
      val edges = t("lshStarEdges") {
        val x = Dedup.lshStarEdges(sig, "doc_id", 4, 2).localCheckpoint()
        println(s"[prof] n_edges=${x.count()}")
        x
      }
      val labels = t("componentLabels (iterative)") {
        val x = Components.componentLabels(edges, "id_a", "id_b").localCheckpoint()
        x.count(); x
      }
      t("clusters join + order + noop") {
        docs.select(col("doc_id"))
          .join(labels.select(col("id").as("__cc_id"),
            col("component").as("__cc_component")),
            col("doc_id") === col("__cc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("__cc_component"), col("doc_id")).as("cluster_id"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      t("full query (catalog dedup_clusters)") {
        graft.SparkEntry.queries("dedup_clusters")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
