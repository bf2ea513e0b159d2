package graft.functions

import graft.SparkSpec

class ILogSpec extends SparkSpec {

  test("JVM twin and the Spark SQL face agree bit-for-bit") {
    val ns = (1L to 2000L) ++ Seq(4095L, 4096L, 4097L, 1L << 20, (1L << 20) + 7,
      (1L << 40) - 1, 1L << 40, (1L << 40) + 12345)
    import spark.implicits._
    val got = ns.toDF("v")
      .selectExpr("v", s"${ILog.qlogSqlSpark("v")} AS q")
      .as[(Long, Long)].collect().toMap
    ns.foreach { n =>
      assert(got(n) === ILog.qlog2Fp20(n), s"n=$n")
    }
  }

  test("exact at powers of two; strictly increasing") {
    (0 until 42).foreach { e =>
      assert(ILog.qlog2Fp20(1L << e) === e.toLong * 1048576L)
    }
    (1L until 5000L).foreach { n =>
      assert(ILog.qlog2Fp20(n + 1) > ILog.qlog2Fp20(n), s"n=$n")
    }
  }

  test("Mitchell error bound: within 0.0861 bits of true log2") {
    val maxErrBits = 0.0861
    (1L to 100000L).foreach { n =>
      val approx = ILog.qlog2Fp20(n).toDouble / 1048576.0
      val exact = math.log(n.toDouble) / math.log(2.0)
      assert(math.abs(approx - exact) <= maxErrBits, s"n=$n err=${approx - exact}")
    }
  }

  test("domain top: 2^44 - 1 computes, 2^44 is rejected (no silent Long wrap)") {
    val top = (1L << 44) - 1
    // At the domain edge the mantissa product is (2^43 - 1)·2^20 < 2^63.
    assert(ILog.qlog2Fp20(top) === 43L * 1048576L + ((top - (1L << 43)) * 1048576L) / (1L << 43))
    intercept[IllegalArgumentException] { ILog.qlog2Fp20(1L << 44) }
  }

  test("pFp34: JVM twin and Spark SQL face agree; quantization is exact") {
    import spark.implicits._
    val cases = Seq((1L, 3L), (1L, 50001L), (7L, 8L), (123456L, 987654L),
      ((1L << 29) - 1, 1L), ((1L << 29) - 1, (1L << 34)))
    val got = cases.toDF("n", "d")
      .selectExpr("n", "d", s"${ILog.pFp34Spark("n", "d")} AS p")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (n, d, p) =>
      assert(p === ILog.pFp34(n, d), s"n=$n d=$d")
      assert(p === (BigInt(n) * (BigInt(1) << 34) / d).toLong, s"n=$n d=$d")
    }
  }

  test("pFp34 numerator domain: 2^29 - 1 computes, 2^29 rejected on both faces") {
    assert(ILog.pFp34((1L << 29) - 1, 1L) === (((1L << 29) - 1) << 34))
    intercept[IllegalArgumentException] { ILog.pFp34(1L << 29, 1L) }
    val err = intercept[Exception] {
      spark.sql(s"SELECT ${ILog.pFp34Spark("n", "d")} FROM VALUES (536870912L, 1L) AS t(n, d)").collect()
    }
    assert(err.getMessage.contains("pFp34: numerator >= 2^29"))
  }

  test("power-of-two division is an exact exponent shift in qlog2") {
    // −log2(m/2^35) = 35·2^20 − qlog2(m) exactly: qlog2(2^k·m) = k·2^20 +
    // qlog2(m) because the common 2^k factor cancels in the floor division.
    Seq(1L, 3L, 77L, 12345L, (1L << 29) - 1).foreach { m =>
      (1 to 10).foreach { k =>
        assert(ILog.qlog2Fp20(m << k) === k * 1048576L + ILog.qlog2Fp20(m),
          s"m=$m k=$k")
      }
    }
  }

  test("values below 1 are rejected on both faces") {
    intercept[IllegalArgumentException] { ILog.qlog2Fp20(0L) }
    val err = intercept[Exception] {
      spark.sql(s"SELECT ${ILog.qlogSqlSpark("v")} FROM VALUES (0L) AS t(v)").collect()
    }
    assert(err.getMessage.contains("qlog2: value below 1"))
  }
}
