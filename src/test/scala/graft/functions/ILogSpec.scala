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

  test("values below 1 are rejected on both faces") {
    intercept[IllegalArgumentException] { ILog.qlog2Fp20(0L) }
    val err = intercept[Exception] {
      spark.sql(s"SELECT ${ILog.qlogSqlSpark("v")} FROM VALUES (0L) AS t(v)").collect()
    }
    assert(err.getMessage.contains("qlog2: value below 1"))
  }
}
