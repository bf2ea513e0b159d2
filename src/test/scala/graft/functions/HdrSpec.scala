package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Hdr]]'s three faces must agree: the SQL-text bucket/lower-bound
  * expressions (what the catalog query and the DuckDB oracle run), the
  * JVM twins (what [[HdrSketch]] reduces with), and the distributed
  * extraction plan ([[Hdr.quantileEstimates]]) — plus the ≤2^-m relative
  * error contract against exact `percentile()`.
  */
class HdrSpec extends SparkSpec {
  import spark.implicits._

  private val m = 7
  private val p = 1L << m

  // Edges: 0, the exact small range, the first wide bucket, bucket
  // boundaries, and large values.
  private val edgeValues: Seq[Long] = Seq(
    0L, 1L, 2L, p - 1, p, p + 1, 2 * p - 1, 2 * p, 2 * p + 1,
    255L, 256L, 257L, 1023L, 1024L, 99999L, 1000000L, 123456789L,
    (1L << 40) - 1, 1L << 40, (1L << 40) + 12345)

  test("SQL bucket/lowerBound expressions equal the JVM twins on edge values") {
    val df = edgeValues.toDF("v")
      .withColumn("b", expr(Hdr.bucketSqlSpark("v", m)))
      .withColumn("lb", expr(Hdr.lowerBoundSqlSpark("b", m)))
    df.collect().foreach { r =>
      val v = r.getLong(0)
      assert(r.getLong(1) === Hdr.bucketOf(v, m), s"bucket($v)")
      assert(r.getLong(2) === Hdr.lowerBoundOf(Hdr.bucketOf(v, m), m), s"lb($v)")
    }
  }

  test("bucket is monotone and lb is the true bucket lower bound") {
    // contiguous sweep across the small/wide boundary
    val vs = (0L until 4 * p) ++ Seq(1L << 20, (1L << 20) + 1)
    val bs = vs.map(Hdr.bucketOf(_, m))
    bs.sliding(2).foreach { w => assert(w(0) <= w(1)) }
    vs.foreach { v =>
      val b = Hdr.bucketOf(v, m)
      val lb = Hdr.lowerBoundOf(b, m)
      assert(lb <= v, s"lb($v)")
      assert(Hdr.bucketOf(lb, m) === b, s"lb of bucket($v) lands in the same bucket")
    }
  }

  private lazy val grouped = {
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 0 until (if (g == "a") 1013 else if (g == "b") 96 else 7)
    } yield (g, ((i.toLong * 7919 + g.hashCode.abs) % 3000000) + 1)
    rows.toDF("g", "v")
  }

  private val qs = Seq((1L, 2L, "p50"), (9L, 10L, "p90"), (99L, 100L, "p99"))

  test("plan path and aggregator path produce identical estimates") {
    val plan = Hdr.quantileEstimates(grouped, Seq("g"), "v", m, qs)
      .orderBy("g").collect()
    val sketch = udaf(HdrSketch(m))
    val agg = grouped.groupBy("g").agg(sketch(col("v")).as("h"))
      .orderBy("g").collect()
    plan.zip(agg).foreach { case (pr, ar) =>
      assert(pr.getString(0) === ar.getString(0))
      val flat = ar.getSeq[Long](1)
      val hist = flat.grouped(2).map(x => x(0) -> x(1)).toMap
      val ests = Hdr.quantilesOf(hist, m, qs.map(q => (q._1, q._2)))
      qs.indices.foreach { i =>
        assert(pr.getLong(2 + i) === ests(i), s"${qs(i)._3} of ${pr.getString(0)}")
      }
    }
  }

  test("estimates obey the <= 2^-m relative error bound vs exact percentile") {
    val est = Hdr.quantileEstimates(grouped, Seq("g"), "v", m, qs)
      .orderBy("g").collect()
    // exact rank-ceil(q*n) order statistic per group (discrete, no
    // interpolation — matches the sketch's rank definition)
    val byG = grouped.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    est.foreach { r =>
      val sortedVs = byG(r.getString(0))
      val n = sortedVs.length.toLong
      assert(r.getLong(1) === n)
      qs.zipWithIndex.foreach { case ((num, den, name), i) =>
        val rank = (n * num + den - 1) / den
        val exact = sortedVs((rank - 1).toInt)
        val lb = r.getLong(2 + i)
        assert(lb <= exact, s"$name lower bound")
        assert(exact <= lb + (lb >> m) + 1, s"$name within 2^-$m relative error")
      }
    }
  }

  test("weighted estimates equal unweighted estimates over the expanded multiset") {
    // weight w ≡ repeating the row w times: the weighted sketch over
    // (v, w) must equal the unweighted sketch over v repeated w times
    val weighted = Seq(("a", 10L, 3L), ("a", 500L, 1L), ("a", 200L, 6L),
      ("b", 7L, 2L), ("b", 9L, 5L)).toDF("g", "v", "w")
    val expanded = weighted.as[(String, Long, Long)].collect()
      .flatMap { case (g, v, w) => Seq.fill(w.toInt)((g, v)) }
      .toSeq.toDF("g", "v")
    val got = Hdr.quantileEstimates(weighted, Seq("g"), "v", m, qs, Some("w"))
      .orderBy("g").collect()
    val want = Hdr.quantileEstimates(expanded, Seq("g"), "v", m, qs)
      .orderBy("g").collect()
    got.zip(want).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("sketch merge over shards equals the global sketch") {
    val s = HdrSketch(m)
    val values = grouped.filter($"g" === "a").collect().map(_.getLong(1))
    val (h1, h2) = values.splitAt(values.length / 3)
    def reduceAll(vs: Seq[Long]) = vs.foldLeft(s.zero)(s.reduce)
    val merged = s.merge(reduceAll(h1.toSeq), reduceAll(h2.toSeq))
    assert(s.finish(merged) === s.finish(reduceAll(values.toSeq)))
    // merge is commutative
    assert(s.finish(s.merge(reduceAll(h2.toSeq), reduceAll(h1.toSeq))) ===
      s.finish(merged))
  }

  test("negative values are rejected (the sketch's domain is cents-like)") {
    intercept[IllegalArgumentException] { Hdr.bucketOf(-1L, m) }
    // the SQL face mirrors the JVM guard: a negative input must FAIL,
    // not silently take the v < P branch and emit a negative "bucket"
    val err = intercept[Exception] {
      spark.sql(s"SELECT ${Hdr.bucketSqlSpark("v", m)} AS b FROM VALUES (-1L) AS t(v)")
        .collect()
    }
    assert(err.getMessage.contains("Hdr bucket: negative value"))
  }
}
