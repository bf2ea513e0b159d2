package graft.operators

import graft.SparkSpec
import graft.functions.ILog

class InfoStatsSpec extends SparkSpec {
  import spark.implicits._

  private def entropy(texts: (Long, String)*) =
    InfoStats.tokenEntropy(texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, e, a) => id -> ((n, e, a)) }.toMap

  test("all-distinct tokens: entropy is exactly qlog2(N) per token") {
    // every c = 1 → c·qlog2(c) = 0, so ent = N·qlog2(N), avg = qlog2(N)
    val got = entropy((1L, "a b c d"))(1L)
    val q4 = ILog.qlog2Fp20(4L) // exact: 2.0 in fp20
    assert(got === ((4L, 4L * q4, q4)))
    assert(q4 === 2L * 1048576L)
  }

  test("a single repeated token has zero entropy") {
    val got = entropy((1L, "spam spam spam spam spam"))(1L)
    assert(got === ((5L, 0L, 0L)))
  }

  test("repetition strictly lowers entropy; tokenization lowercases") {
    val m = entropy((1L, "A a b b"), (2L, "a b c d"))
    assert(m(1L)._1 === 4L && m(2L)._1 === 4L)
    assert(m(1L)._2 < m(2L)._2) // {a:2,b:2} below all-distinct
    // exact value: 4·qlog2(4) − 2·(2·qlog2(2)) = 8·2^20 − 4·2^20
    assert(m(1L)._2 === 4L * 1048576L)
  }

  test("entropy numerator is never negative (monotone qlog2 bound)") {
    val rows = (1L to 50L).map(i => i -> (s"tok${i % 7} " * (1 + i % 9).toInt).trim)
    val got = entropy(rows: _*)
    assert(got.values.forall { case (_, e, a) => e >= 0 && a >= 0 })
  }
}
