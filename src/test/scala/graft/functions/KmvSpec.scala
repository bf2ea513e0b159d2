package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16
  private val s = KmvSketch(k)

  private def reduceAll(vs: Seq[Long]) = vs.foldLeft(s.zero)(s.reduce)

  test("buffer keeps the k smallest DISTINCT values — duplicates are no-ops") {
    val vs = Seq(5L, 3L, 5L, 9L, 3L, 7L) ++ (100L to 130L) ++ Seq(5L, 3L)
    val buf = reduceAll(vs)
    assert(buf.size === k)
    assert(buf === buf.sorted.distinct)
    assert(buf.take(4) === Seq(3L, 5L, 7L, 9L))
  }

  test("merge over shards equals the global sketch (and is commutative)") {
    val vs = (0 until 500).map(i => ((i * 7919L) % 211) * 3 + 1)
    val (a, b) = vs.splitAt(137)
    val merged = s.merge(reduceAll(a), reduceAll(b))
    assert(merged === reduceAll(vs))
    assert(s.merge(reduceAll(b), reduceAll(a)) === merged)
  }

  test("finish returns u_k, or -1 below k distinct") {
    assert(s.finish(reduceAll(Seq(1L, 2L, 3L))) === -1L)
    val vs = (1L to 100L).map(_ * 11)
    assert(s.finish(reduceAll(vs)) === 11L * k)
  }

  test("estimator lands within the standard error regime on random-ish hashes") {
    // 5000 distinct keys hashed to 52-bit md5 prefixes via the same path
    // the catalog query uses; KMV with k=64 has rse ~ 1/sqrt(64) = 12.5%
    val kk = 64
    val kmv = udaf(KmvSketch(kk))
    val est = spark.range(5000)
      .select(expr("cast(conv(substring(md5(cast(id as string)), 1, 13), 16, 10) as bigint)").as("u"))
      .agg(kmv(col("u")).as("uk"))
      .select(expr(s"${kk - 1}.0 / (cast(uk as double) / 4503599627370496.0)"))
      .head.getDouble(0)
    assert(math.abs(est - 5000) / 5000 < 0.4, s"estimate $est too far from 5000")
  }

  test("set algebra: union-merge + rho intersection estimator land near truth") {
    // A = 0..2999, B = 2000..5999 → |A∪B| = 6000, |A∩B| = 1000
    def h(i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(7).map("%02x".format(_)).mkString.take(13), 16)
    }
    val kk = 64
    val s64 = KmvBuffer(kk)
    def sketch(ids: Range) = ids.foldLeft(s64.zero)((b, i) => s64.reduce(b, h(i)))
    val a = sketch(0 until 3000)
    val b = sketch(2000 until 6000)
    val union = s64.merge(a, b)
    val uk = union.last
    val estU = (kk - 1).toDouble / (uk.toDouble / 4503599627370496.0)
    val rho = union.count(x => a.contains(x) && b.contains(x))
    val estI = rho.toDouble / kk * estU
    assert(math.abs(estU - 6000) / 6000 < 0.4, s"union estimate $estU")
    assert(math.abs(estI - 1000) / 1000 < 0.8, s"intersection estimate $estI (rho=$rho)")
  }

  test("registered SQL surface matches the DataFrame path") {
    graft.functions.Registry.register(spark)
    spark.range(2000).selectExpr("id % 4 as g",
      "cast(conv(substring(md5(cast(id as string)), 1, 13), 16, 10) as bigint) as u")
      .createOrReplaceTempView("kmv_sql_probe")
    val sql = spark.sql(
      "SELECT g, kmv_uk(u) AS uk FROM kmv_sql_probe GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kmv = udaf(KmvSketch(graft.functions.Registry.KmvK))
    val df = spark.table("kmv_sql_probe").groupBy("g").agg(kmv(col("u")).as("uk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql === df)
    assert(sql.values.forall(_ > 0))
  }

  test("k below 2 is rejected") {
    intercept[IllegalArgumentException] { KmvSketch(1) }
  }
}
