package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native DotProduct expression vs the composable HOF reference form. */
class DotProductSpec extends SparkSpec {

  test("float arrays: native result is bit-identical to the HOF form") {
    import spark.implicits._
    val df = Seq.tabulate(50)(i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
        Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat)))
      .toDF("a", "b")
    val rows = df.select(
      Vectors.dot($"a", $"b").as("native"),
      Vectors.dotHof(Vectors.toDouble($"a"), Vectors.toDouble($"b")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("double arrays and exact small cases") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Vectors.dot($"a", $"b")).collect().head.getDouble(0) === 32.0)
  }

  test("null array yields null; mismatched lengths use the shorter") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Array(3.0f, 4.0f, 5.0f)),
      (None, Array(1.0f)))
      .toDF("a", "b")
    val rows = df.select(Vectors.dot($"a", $"b").as("d")).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("norm and cosine built on the native dot") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.norm($"a").as("n"),
      Vectors.cosine($"a", $"b").as("c")).collect().head
    assert(r.getDouble(0) === 5.0)
    assert(math.abs(r.getDouble(1) - 24.0 / 25.0) < 1e-12)
  }
}
