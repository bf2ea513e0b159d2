package graft.operators

import graft.SparkSpec
import graft.functions.ILog
import org.apache.spark.sql.functions._

class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Separable fixture: positive docs speak {apple, banana}, negative
  // docs speak {car, door}; one mixed doc and one out-of-vocab doc.
  private lazy val tokens = Seq(
    (1L, true, "apple"), (1L, true, "banana"), (1L, true, "apple"),
    (2L, true, "banana"), (2L, true, "apple"),
    (3L, false, "car"), (3L, false, "door"), (3L, false, "car"),
    (4L, false, "door"), (4L, false, "car")
  ).toDF("doc_id", "is_pos", "w")

  private lazy val counts = NbClassifier.tokenClassCounts(tokens)
  private lazy val scalars = NbClassifier.modelScalars(tokens)

  private def scoreOf(docTokens: Seq[(Long, String)]): Map[Long, (Long, Boolean)] =
    NbClassifier.score(docTokens.toDF("doc_id", "w"), counts, scalars)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_fp20"), r.getAs[Boolean]("pred_pos")))
      .toMap

  test("persisted model tables score identically to the inline model (exact BIGINT round-trip)") {
    val (countsT, scalT) = ("nbspec_counts", "nbspec_scal")
    try {
      graft.sources.Warehouse.writeTable(counts, countsT)
      graft.sources.Warehouse.writeTable(scalars, scalT)
      val toScore = tokens.select("doc_id", "w")
      val inline = NbClassifier.score(toScore, counts, scalars)
        .orderBy("doc_id").collect().toSeq
      val persisted = NbClassifier
        .score(toScore, spark.table(countsT), spark.table(scalT))
        .orderBy("doc_id").collect().toSeq
      assert(persisted === inline)
    } finally {
      graft.sources.Warehouse.dropWithLocation(spark, countsT)
      graft.sources.Warehouse.dropWithLocation(spark, scalT)
    }
  }

  test("class counts and scalars are the plain training-set counts") {
    val c = counts.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(c("apple") === ((3L, 0L)))
    assert(c("car") === ((0L, 3L)))
    val s = scalars.head()
    assert(s.getAs[Long]("npos") === 5L)
    assert(s.getAs[Long]("nneg") === 5L)
    assert(s.getAs[Long]("vsz") === 4L)
    assert(s.getAs[Long]("dpos") === 2L && s.getAs[Long]("dneg") === 2L)
  }

  test("the classifier separates the classes it was trained on") {
    val m = scoreOf(Seq(10L -> "apple", 10L -> "banana",
      20L -> "car", 20L -> "door"))
    assert(m(10L)._1 > 0 && m(10L)._2, m)
    assert(m(20L)._1 < 0 && !m(20L)._2, m)
  }

  test("an out-of-vocab document scores exactly the prior (zero here)") {
    // cp = cn = 0 for unseen tokens and npos+V = nneg+V, so every token
    // weight cancels; dpos = dneg makes the prior 0 too.
    val m = scoreOf(Seq(30L -> "zebra", 30L -> "quark"))
    assert(m(30L)._1 === 0L)
    assert(!m(30L)._2) // score > 0 is strict
  }

  test("score matches the JVM qlog2 closed form") {
    // doc {apple}: prior 0 + [qlog(3+1) − qlog(5+4) − qlog(0+1) + qlog(5+4)]
    val expected = ILog.qlog2Fp20(4) - ILog.qlog2Fp20(1)
    val m = scoreOf(Seq(40L -> "apple"))
    assert(m(40L)._1 === expected)
  }

  test("mixed evidence sums token weights (banana vs two cars loses)") {
    val m = scoreOf(Seq(50L -> "banana", 50L -> "car", 50L -> "car"))
    val banana = ILog.qlog2Fp20(3) - ILog.qlog2Fp20(1)
    val car = ILog.qlog2Fp20(1) - ILog.qlog2Fp20(4)
    assert(m(50L)._1 === banana + 2 * car)
    assert(m(50L)._1 < 0 && !m(50L)._2)
  }
}
