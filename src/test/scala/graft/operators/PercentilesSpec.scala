package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Percentiles.fromHistogram]] must be BIT-identical to Spark's exact
  * `percentile()` — it replaces it in a20_mad / sketch_pct_bound, whose
  * oracle hashes were proven against `percentile` ≡ `quantile_cont`.
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  // Fixed-point domain (cents/100), repeated values, odd AND even group
  // sizes, interpolating and non-interpolating quantiles.
  private lazy val data = {
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0 until (if (g == "a") 101 else if (g == "b") 96 else 7)
    } yield (g, ((i * 37 + g.hashCode.abs) % 250).toDouble / 4)
    rows.toDF("g", "v")
  }

  private val qs = Seq(0.0, 0.25, 0.45, 0.5, 0.55, 0.9, 1.0)

  test("fromHistogram is bit-identical to percentile() for every quantile") {
    val hist = Percentiles.histogram(data, Seq("g"), "v")
    val ours = Percentiles.fromHistogram(hist, Seq("g"), "v", "cnt",
        qs.zipWithIndex.map { case (q, i) => q -> s"p$i" })
      .orderBy("g").collect()
    val ref = data.groupBy("g")
      .agg(qs.map(q => expr(s"percentile(v, $q)")).head,
        qs.map(q => expr(s"percentile(v, $q)")).tail: _*)
      .orderBy("g").collect()
    ours.zip(ref).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      qs.indices.foreach { i =>
        val x = a.getDouble(1 + i)
        val y = b.getDouble(1 + i)
        assert(java.lang.Double.doubleToRawLongBits(x) ===
          java.lang.Double.doubleToRawLongBits(y),
          s"group ${a.getString(0)} q=${qs(i)}: hist=$x percentile=$y")
      }
    }
  }

  test("histogram drops NULLs, matching percentile()'s null handling") {
    val withNulls = data.select(col("g"),
      when(col("v") < 10, lit(null)).otherwise(col("v")).as("v"))
    val hist = Percentiles.histogram(withNulls, Seq("g"), "v")
    val ours = Percentiles.fromHistogram(hist, Seq("g"), "v", "cnt",
        Seq(0.5 -> "med"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val ref = withNulls.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("med"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(ours.toSeq === ref.toSeq)
  }

  test("single-row and two-row groups (floor==ceil edge, smallest interpolation)") {
    val tiny = Seq(("x", 3.25), ("y", 1.0), ("y", 2.0)).toDF("g", "v")
    val out = Percentiles.fromHistogram(
        Percentiles.histogram(tiny, Seq("g"), "v"), Seq("g"), "v", "cnt",
        Seq(0.5 -> "med"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq === Seq(("x", 3.25), ("y", 1.5)))
  }

  test("exactRefined is bit-identical to percentile() for every quantile") {
    val ours = Percentiles.exactRefined(data, Seq("g"), "v",
        qs.zipWithIndex.map { case (q, i) => q -> s"p$i" },
        // ~8-unit buckets so the 250-wide domain spans many buckets and
        // bracketing ranks genuinely straddle bucket boundaries
        bucket = v => shiftright(floor(v * 100 + lit(0.5)).cast("long"), 10))
      .orderBy("g").collect()
    val ref = data.groupBy("g")
      .agg(qs.map(q => expr(s"percentile(v, $q)")).head,
        qs.map(q => expr(s"percentile(v, $q)")).tail: _*)
      .orderBy("g").collect()
    ours.zip(ref).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      qs.indices.foreach { i =>
        val x = a.getDouble(1 + i)
        val y = b.getDouble(1 + i)
        assert(java.lang.Double.doubleToRawLongBits(x) ===
          java.lang.Double.doubleToRawLongBits(y),
          s"group ${a.getString(0)} q=${qs(i)}: refined=$x percentile=$y")
      }
    }
  }

  test("exactRefined: shuffle-join path (broadcastTargets=false) matches broadcast path") {
    val bc = Percentiles.exactRefined(data, Seq("g"), "v", Seq(0.5 -> "med"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val sh = Percentiles.exactRefined(data, Seq("g"), "v", Seq(0.5 -> "med"),
        broadcastTargets = false)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(bc.toSeq === sh.toSeq)
  }

  test("exactRefined: quantization-aligned bucket keeps pass 2 bounded by DISTINCT values") {
    // The documented precondition: the pass-2 window ranks the target
    // bucket's (value, cnt) HISTOGRAM, so its task size is the bucket's
    // distinct-value count, not its row count. Safe pattern = bucket
    // aligned to the value's quantization (cents here): 5,000 rows
    // collapse to 40 distinct cents values before the window.
    val heavy = (0 until 5000).map(i => ("h", (i % 40).toDouble / 4))
      .toDF("g", "v")
    val df = Percentiles.exactRefined(heavy, Seq("g"), "v", Seq(0.5 -> "med"))
    // the histogram collapse is a real aggregation below the window —
    // partial (map-side) count, so no task ever holds the raw rows
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), p)
    val ref = heavy.groupBy("g").agg(expr("percentile(v, 0.5)").as("med"))
      .collect().head.getDouble(1)
    assert(df.collect().head.getDouble(1) === ref)
  }

  test("exactRefined: bracketing ranks in ADJACENT buckets interpolate across them") {
    // 4 values, one per bucket (width 1 at cents scale ⇒ shift 0 keeps
    // cents): median rank pair (2,3) lands in two different buckets
    val d4 = Seq(("z", 1.0), ("z", 2.0), ("z", 3.0), ("z", 4.0)).toDF("g", "v")
    val out = Percentiles.exactRefined(d4, Seq("g"), "v", Seq(0.5 -> "med"),
        bucket = v => floor(v).cast("long"))
      .collect()
    assert(out.head.getDouble(1) === 2.5)
  }

  test("exactRefinedChain is bit-identical to percentile() on a continuous domain") {
    // Near-unique continuous values (a ratio of integers): no
    // quantization-aligned single bucket exists — the chain's second
    // level keeps the leaf bounded instead.
    val cont = (0 until 4000).map { i =>
      (if (i % 2 == 0) "x" else "y", (i * 37 % 997 + 1).toDouble / (i % 13 + 3))
    }.toDF("g", "v")
    val ours = Percentiles.exactRefinedChain(cont, Seq("g"), "v",
        qs.zipWithIndex.map { case (q, i) => q -> s"p$i" },
        buckets = Seq(Percentiles.widthBucket(64), Percentiles.widthBucket(0.25)))
      .orderBy("g").collect()
    val ref = cont.groupBy("g")
      .agg(qs.map(q => expr(s"percentile(v, $q)")).head,
        qs.map(q => expr(s"percentile(v, $q)")).tail: _*)
      .orderBy("g").collect()
    ours.zip(ref).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      qs.indices.foreach { i =>
        assert(java.lang.Double.doubleToRawLongBits(a.getDouble(1 + i)) ===
          java.lang.Double.doubleToRawLongBits(b.getDouble(1 + i)),
          s"group ${a.getString(0)} q=${qs(i)}")
      }
    }
  }

  test("exactRefinedChain with one level degenerates to exactRefined exactly") {
    val one = Percentiles.exactRefinedChain(data, Seq("g"), "v",
        Seq(0.5 -> "med", 0.9 -> "p90"), buckets = Seq(Percentiles.centsBucket))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val ref = Percentiles.exactRefined(data, Seq("g"), "v",
        Seq(0.5 -> "med", 0.9 -> "p90"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(one.toSeq === ref.toSeq)
  }

  test("exactRefinedChain: three levels and shuffle-join targets still match") {
    val cont = (0 until 2000).map(i => ("t", (i * 97 % 1009).toDouble / 7))
      .toDF("g", "v")
    val ours = Percentiles.exactRefinedChain(cont, Seq("g"), "v",
        Seq(0.25 -> "q1", 0.75 -> "q3"),
        buckets = Seq(Percentiles.widthBucket(32), Percentiles.widthBucket(4),
          Percentiles.widthBucket(0.5)),
        broadcastTargets = false)
      .collect().head
    val ref = cont.groupBy("g")
      .agg(expr("percentile(v, 0.25)"), expr("percentile(v, 0.75)"))
      .collect().head
    assert(java.lang.Double.doubleToRawLongBits(ours.getDouble(1)) ===
      java.lang.Double.doubleToRawLongBits(ref.getDouble(1)))
    assert(java.lang.Double.doubleToRawLongBits(ours.getDouble(2)) ===
      java.lang.Double.doubleToRawLongBits(ref.getDouble(2)))
  }
}
