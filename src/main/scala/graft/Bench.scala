package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Headline benchmark: times every catalog query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line (stdout) plus the same JSON to `BENCH.json` in the
  * working directory (sbt prefixes stdout with "[info]", which broke the
  * driver's parse in round 1 — the file is the decoration-free channel).
  *
  * Measurement rules (learned round 1):
  *  - Full-plan execution via the `noop` sink — `.count()` lets Catalyst
  *    prune computed projections and sorts, under-measuring exactly the
  *    projection-heavy queries the bench claims to time.
  *  - Interleaved passes: the host VM shows sporadic multi-second I/O
  *    stalls that hit a *contiguous block* of run order. Three back-to-back
  *    runs of one query can all land in one stall window; three full passes
  *    over the whole suite separate a query's runs by minutes, so min-of-
  *    passes survives any stall shorter than a pass.
  *  - A failed run records -1 (never its elapsed time — failures throw
  *    fast and would masquerade as good numbers); failed queries are
  *    excluded from the total and listed in an `errors` array.
  *  - Stall escape hatch: queries whose min is still suspiciously large
  *    (> 5 s at sf0.1 — clean round-3 max is 3.1 s) get one extra retry
  *    pass at the end, when any stall window has likely passed.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated name filter (SPARK_GRAFT_ONLY) for targeted
    // runs — e.g. the heavy families at a synthesized 100× scale factor,
    // where timing the full 125-query catalog would mostly measure fixed
    // overhead on fixed-slice queries.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // Fail loudly on names that match nothing: a typo (or an empty string
    // → Set("")) would otherwise yield an empty/short query set and a
    // meaningless near-zero total that reads like a real measurement.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the catalog: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    require(queries.nonEmpty, "SPARK_GRAFT_ONLY filtered the bench to zero queries")

    /** One timed full-plan execution; -1.0 marks a failure. */
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] query failed: ${e.getMessage}")
        -1.0
      }
    }

    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to passes; (name, fn) <- queries)
      samples(name) = runOnce(fn) :: samples(name)

    def best(name: String): Double = {
      val ok = samples(name).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    }

    // Retry pass for stall suspects: a min that never dropped below 5 s is
    // more likely a stall that outlasted all passes than a real cost
    // (clean round-3 max is 3.1 s — the connected-component trio).
    for ((name, fn) <- queries if best(name) > 5.0)
      samples(name) = runOnce(fn) :: samples(name)

    val mins = queries.map { case (name, _) => name -> best(name) }
    val errors = mins.collect { case (n, t) if t < 0 => n }
    val total = mins.collect { case (_, t) if t >= 0 => t }.sum
    val qs = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH.json"), json + "\n")
    // The driver records only the LAST ~2000 chars of stdout and parses a
    // JSON line out of them. The full per-query line is ~5 KB for a
    // 130-query catalog, so its head ("metric"/"value") fell outside the
    // window every round (BENCH_r01..r07 all show parsed:null). Print the
    // full line first for humans/BENCH.json diffing, then a LAST line
    // guaranteed to fit: same schema, per-query map truncated to the
    // slowest entries that fit the window (the sub-second tail is noise;
    // the full map is always in BENCH.json).
    println(json)
    val budget = 1800
    def compact(entries: Seq[(String, Double)]): String = {
      val qj = entries.map { case (k, v) => f""""$k":${v}%.3f""" }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${mins.size},"queries_shown":${entries.size},"queries":$qj,"errors":$errs,"sf":"$sfDir"}"""
    }
    val bySlowest = mins.filter(_._2 >= 0).sortBy(-_._2)
    val shown = (bySlowest.size to 0 by -1).view
      .map(n => compact(bySlowest.take(n)))
      .find(_.length <= budget)
      .getOrElse(compact(Nil))
    println(shown)
    spark.stop()
  }
}
