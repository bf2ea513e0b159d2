package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference Morton interleave (bit-by-bit). */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("spread16 matches the closed-form corner cases") {
    val out = Seq(0L, 1L, 0xFFFFL, 0x8000L).toDF("v")
      .select(Layout.spread16(col("v")).as("s"))
      .collect().map(_.getLong(0))
    assert(out === Array(0L, 1L, 0x55555555L, 0x40000000L))
  }

  test("morton2 equals the bit-by-bit reference on deterministic samples") {
    val samples = for {
      x <- Seq(0L, 1L, 255L, 256L, 1499L, 65535L)
      y <- Seq(0L, 1L, 42L, 2404L, 65535L)
    } yield (x, y)
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    samples.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"morton2($x, $y)")
    }
  }

  test("mortonX/mortonY invert morton2") {
    val samples = Seq((0L, 0L), (1L, 2L), (1499L, 2404L), (65535L, 65535L),
      (12345L, 54321L))
    val rows = samples.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.mortonX(Layout.morton2(col("x"), col("y"))).as("rx"),
        Layout.mortonY(Layout.morton2(col("x"), col("y"))).as("ry"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) && r.getLong(3) === r.getLong(1))
    }
  }

  test("z-order layout PRUNES parquet row groups a 1-D sort cannot (scan metrics)") {
    // The actual-skip proof behind the envelope argument: a 256×256 grid
    // written twice — range-partitioned+sorted by x alone vs by the
    // morton2(x, y) key (64 files each; a z-range of 1024 keys is one
    // 32×32 tile). A y-only slice predicate then hits the pushed-filter
    // row-group stats: every x-sorted file spans all of y (nothing
    // skips), while only the 8 z-tiles intersecting the slice are read.
    // Measured on the scan's own numOutputRows metric — rows the parquet
    // reader actually surfaced after row-group/page pruning.
    val base = tmpDir("zprune")
    val grid = (for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y))
      .toDF("x", "y")
    val byX = s"$base/by_x"; val byZ = s"$base/by_z"
    grid.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(byX)
    grid.withColumn("z", Layout.morton2(col("x"), col("y")))
      .repartitionByRange(64, col("z")).sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(byZ)
    def rowsRead(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("y") >= 100 && col("y") <= 115)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
      assert(scans.head.metadata("PushedFilters").contains("GreaterThanOrEqual(y,"),
        scans.head.metadata("PushedFilters"))
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val xRows = rowsRead(byX)
    val zRows = rowsRead(byZ)
    // x-sorted: no file can skip a y predicate; z-ordered: ≥ 4× fewer
    // rows surface from the scan (measured ~8× — 8 of 64 tiles touched)
    assert(xRows >= 60000L, s"x-sorted layout unexpectedly skipped: $xRows")
    assert(zRows * 4 <= xRows, s"z-ordered read $zRows rows vs x-sorted $xRows")
  }

  test("z-ordering bounds both dimensions per key-prefix bucket") {
    // 64x64 grid; bucket by the top 4 bits of the 12-bit morton key:
    // each bucket must cover at most a 16x32 (or 32x16) rectangle,
    // where a single-column sort would leave one dimension unbounded.
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val spans = grid
      .withColumn("b", shiftright(Layout.morton2(col("x"), col("y")), 8))
      .groupBy("b")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length === 16)
    spans.foreach { r =>
      assert(r.getLong(1) <= 31 && r.getLong(2) <= 31,
        s"bucket ${r.getLong(0)} spans ${r.getLong(1)}x${r.getLong(2)}")
    }
  }

  /** Brute-force z set of a box via the bit-by-bit reference, merged
    * into maximal intervals — the ground truth [[Layout.zIntervals]]
    * must reproduce when uncapped.
    */
  private def refIntervals(x0: Long, x1: Long, y0: Long,
      y1: Long): Seq[(Long, Long)] = {
    val zs = (for { x <- x0 to x1; y <- y0 to y1 } yield mortonRef(x, y)).sorted
    zs.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, z) if z == hi + 1 => (lo, z) :: tail
      case (acc, z) => (z, z) :: acc
    }.reverse
  }

  test("zIntervals is exact when uncapped; always sorted, disjoint, merged") {
    val boxes = Seq(
      (0L, 0L, 0L, 0L), (3L, 12L, 5L, 9L), (0L, 15L, 0L, 15L),
      (7L, 7L, 0L, 63L), (60L, 67L, 100L, 115L), (31L, 33L, 31L, 33L))
    boxes.foreach { case (x0, x1, y0, y1) =>
      val got = Layout.zIntervals(x0, x1, y0, y1, maxIntervals = 100000)
      assert(got === refIntervals(x0, x1, y0, y1), s"box [$x0,$x1]x[$y0,$y1]")
      got.sliding(2).foreach {
        case Seq((_, h), (l, _)) => assert(h + 1 < l, "unmerged or overlapping")
        case _ =>
      }
    }
  }

  test("zIntervals respects the cap by over-covering, never dropping") {
    val (x0, x1, y0, y1) = (3L, 200L, 17L, 90L)
    val exact = refIntervals(x0, x1, y0, y1)
    assert(exact.size > 8, s"box too simple: ${exact.size} maximal runs")
    val capped = Layout.zIntervals(x0, x1, y0, y1, maxIntervals = 8)
    assert(capped.size <= 8)
    // superset: every exact interval is inside some capped interval
    exact.foreach { case (lo, hi) =>
      assert(capped.exists { case (cl, ch) => cl <= lo && hi <= ch },
        s"[$lo,$hi] dropped by the capped cover")
    }
    // the uncapped cover of the same box stays exact
    assert(Layout.zIntervals(x0, x1, y0, y1, 100000) === exact)
  }

  test("z-interval cover prunes PARTITIONS the single covering z-range cannot") {
    // 256×256 grid partitioned by the 6-bit zkey prefix (64 directory
    // buckets = 64 z tiles). A 2-D box touches few tiles, but the
    // single covering range [morton(x0,y0), morton(x1,y1)] spans every
    // curve excursion between the corners — so its bucket span reads
    // ~3× the directories the zIntervals bucket set opens. Measured on
    // the scan's own numFiles metric (partition pruning = fewer files
    // even listed into the scan).
    val base = tmpDir("zrangeprune")
    val grid = (for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y))
      .toDF("x", "y")
      .withColumn("z", Layout.morton2(col("x"), col("y")))
      .withColumn("zb", shiftright(col("z"), 10))
    grid.repartition(col("zb")).sortWithinPartitions(col("zb"), col("z"))
      .write.partitionBy("zb").mode("overwrite").parquet(base)
    // box 100-139 × 60-99: 6 z tiles (buckets {7,13,15,18,24,26}) vs a
    // corner-to-corner bucket span of 7..26 = 20 directories
    val (x0, x1, y0, y1) = (100L, 139L, 60L, 99L)
    def filesRead(pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(base).filter(pred)
      val n = df.count()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
      (scans.map(_.metrics("numFiles").value).sum, n)
    }
    val box = col("x").between(x0, x1) && col("y").between(y0, y1)
    val ivs = Layout.zIntervals(x0, x1, y0, y1)
    val naive = col("zb").between(
      mortonRef(x0, y0) >> 10, mortonRef(x1, y1) >> 10) && box
    val pruned = col("zb").isin(Layout.zBuckets(ivs, 10): _*) &&
      Layout.zRangeFilter(col("z"), col("x"), col("y"), x0, x1, y0, y1)
    val (naiveFiles, naiveRows) = filesRead(naive)
    val (prunedFiles, prunedRows) = filesRead(pruned)
    // both are CORRECT (the exact box residual rides each scan) ...
    assert(naiveRows === 40L * 40L && prunedRows === 40L * 40L)
    // ... but the interval cover opens ≤ half the directories
    assert(prunedFiles * 2 <= naiveFiles,
      s"interval cover read $prunedFiles files vs naive $naiveFiles")
  }
}
