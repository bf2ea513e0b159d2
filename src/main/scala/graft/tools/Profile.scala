package graft.tools

import org.apache.spark.sql.SparkSession

/** Local profiling harness: run named catalog queries twice (cold/warm),
  * print timings and optionally the formatted plan.
  * Usage: runMain graft.tools.Profile <sfDir> <q1,q2,...> [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val noop = args.length > 2 && args(2) == "noop"
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // noop = full-plan execution (count() lets Catalyst prune
        // computed columns — Bench's measurement mode); count = rows too
        val n = if (noop) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); -1L
        } else fn(spark, sfDir).count()
        println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
