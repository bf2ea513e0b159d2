package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-trips through every supported format preserve values. */
class FormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private lazy val df = {
    val rows = (1 to 100).map(i => Row(i.toLong, s"name_$i", i * 1.5))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("parquet/orc/json/csv round-trips preserve values") {
    (Formats.Columnar ++ Formats.Text).foreach { fmt =>
      val path = tmpDir(s"fmt_$fmt") + "/data"
      Formats.write(df, fmt, path)
      val back = Formats.read(spark, fmt, path, Some(schema))
        .orderBy("id").collect()
      val orig = df.orderBy("id").collect()
      assert(back === orig, s"format=$fmt")
    }
  }

  test("csv round-trip preserves whitespace and quoted embedded newlines") {
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("t", StringType)))
    val rows = Seq(
      Row(1L, "  leading"), Row(2L, "trailing  "),
      Row(3L, "embedded\nnewline"), Row(4L, "quote\"comma,"))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), s2)
    val path = tmpDir("fmt_csv_ws") + "/data"
    Formats.write(d, "csv", path)
    val back = Formats.read(spark, "csv", path, Some(s2))
      .orderBy("id").collect()
    assert(back === d.orderBy("id").collect())
  }

  test("partitioned write produces partition directories readable with pruning") {
    val path = tmpDir("fmt_part") + "/data"
    val dfp = df.withColumn("bucket",
      org.apache.spark.sql.functions.col("id") % 4)
    Formats.write(dfp, "parquet", path, partitionBy = Seq("bucket"))
    val pruned = spark.read.parquet(path).filter("bucket = 2")
    assert(pruned.count() === 25)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
