package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantization + vector-stat column builders. */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(0.5f, -1.0f, 0.25f)),
    (2L, Seq(0.0f, 0.0f, 2.0f)),
    (3L, Seq(-3.0f, 1.5f, 0.75f))).toDF("id", "v")

  test("maxAbs is the max absolute coordinate") {
    val out = vecs.select(col("id"), Vectors.maxAbs(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
  }

  test("int8 quantization maps max|x| to ±127 and stays in range") {
    val q = vecs
      .withColumn("mx", Vectors.maxAbs(col("v")))
      .select(col("id"), Vectors.quantizeInt8(col("v"), col("mx")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(1L) === Seq(64L, -127L, 32L))   // floor(±x*127 + .5)
    assert(q(2L) === Seq(0L, 0L, 127L))
    assert(q(3L) === Seq(-127L, 64L, 32L))
    assert(q.values.flatten.forall(x => x >= -127 && x <= 127))
  }

  test("reconstruction error is bounded by half a quantization step") {
    val out = vecs
      .withColumn("mx", Vectors.maxAbs(col("v")))
      .withColumn("q", Vectors.quantizeInt8(col("v"), col("mx")))
      .select(col("id"),
        Vectors.quantErrorMicros(col("v"), col("q"), col("mx")).as("err"),
        (col("mx") / 127.0 * 500000 + 1).cast("long").as("half_step_micros"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"vec ${r.getLong(0)}: err ${r.getLong(1)} > half-step ${r.getLong(2)}")
    }
  }

  test("randomProjection: JL distance preservation on the real corpus") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val proj = e.select(col("vec_id") +:
      Vectors.randomProjection(col("embedding"), 64, 16): _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getDouble).toArray).toMap
    val orig = e.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val ratios = for (a <- ids; b <- ids if a < b; dv = d2(orig(a), orig(b)) if dv > 0)
      yield d2(proj(a), proj(b)) / dv
    // 16 dims keeps squared distances within a loose JL band; the MEAN
    // ratio concentrates near 1 (unbiasedness of the sign matrix)
    assert(ratios.forall(r => r > 0.2 && r < 5.0),
      s"worst ratios: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.4, s"mean ratio $mean")
  }

  test("randomProjection component matches a direct plane fold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val row = Seq(Tuple1(v)).toDF("embedding")
      .select(Vectors.randomProjection(col("embedding"), 64, 16): _*)
      .collect().head
    (0 until 16).foreach { j =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += v(i).toDouble * Vectors.planeSign(j, i); i += 1 }
      assert(row.getDouble(j) === acc / 4.0, s"p$j")
    }
  }
}
