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
}
