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
}
