package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off stage breakdown for the streaming index-maintenance drains
  * (optimization round 17): times build / feed / drain / serve separately
  * so optimization targets the stage that actually costs.
  * Usage: runMain graft.tools.ProfDrain <sfDir>
  */
object ProfDrain {
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
    import graft.operators.IvfIndex

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val emb = graft.Tables.embeddings(spark, sfDir)
      val splitId = 250L
      val deleteIds = emb
        .filter(col("vec_id") % 10 === 3 && col("vec_id") < 250)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val base = java.nio.file.Files.createTempDirectory("graft_profdl_")
      val sfx = base.getFileName.toString.replace("graft_profdl_", "")
      val n = IvfIndex.names(s"pfdl$sfx", "stream")
      try {
        val old = emb.filter(col("vec_id") < splitId)
        val k0 = t("count old")(math.max(8L, (old.count() + 511) / 512).toInt)
        t("IvfIndex.build")(IvfIndex.build(old, "vec_id", "embedding", n, k = k0))
        val events = emb.filter(col("vec_id") >= splitId)
            .select(col("vec_id"), col("embedding"), lit("add").as("op"))
          .unionByName(emb.filter(col("vec_id").isInCollection(deleteIds))
            .select(col("vec_id"), col("embedding"), lit("del").as("op")))
        val feed = base.resolve("feed").toString
        t("feed write")(events.repartition(3).write.mode("overwrite").parquet(feed))
        val stream = spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
        t("drain (3 batches)") {
          val q = stream.writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
              val t0 = System.nanoTime()
              val b = batch.localCheckpoint()
              val adds = b.filter(col("op") === "add").drop("op")
              val t1 = System.nanoTime()
              if (!adds.isEmpty)
                IvfIndex.appendBatch(spark, n, adds, "vec_id", "embedding")
              val t2 = System.nanoTime()
              val ids = b.filter(col("op") === "del")
                .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
              if (ids.nonEmpty) IvfIndex.delete(spark, n, "vec_id", ids)
              val t3 = System.nanoTime()
              println(f"[prof]   batch $bid: ckpt ${(t1 - t0) / 1e9}%.2fs append ${(t2 - t1) / 1e9}%.2fs delete ${(t3 - t2) / 1e9}%.2fs")
            }
            .option("checkpointLocation", base.resolve("ckpt").toString)
            .trigger(Trigger.AvailableNow())
            .start()
          while (q.isActive) q.awaitTermination(200)
        }
        t("search") {
          IvfIndex.search(spark, n, "vec_id", "embedding", 0L, k = 10,
            nprobe = 2, queryFrom = Some(emb)).localCheckpoint()
        }
      } finally {
        graft.sources.Warehouse.dropWithLocation(spark, n.centroids)
        graft.sources.Warehouse.dropWithLocation(spark, n.postings)
        graft.sources.Warehouse.dropWithLocation(spark,
          IvfIndex.tombstoneTable(n))
        graft.util.Paths.deleteRecursively(base)
      }
    }
    spark.stop()
  }
}
