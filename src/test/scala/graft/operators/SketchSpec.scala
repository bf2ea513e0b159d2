package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Approximate aggregates (HLL++ count-distinct, approx percentile):
  * engine-specific sketches, so no DuckDB oracle — instead assert error
  * bounds against the exact forms on real testdata. These are the
  * sub-linear-memory versions of a11_count_distinct / a10_percentiles
  * for cardinalities where exact state would not fit.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct is within the configured rsd of exact") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.06, s"approx=$approx exact=$exact relErr=$relErr") // 3×rsd
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .collect().head.getDouble(0)
    val approx = li.select(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .collect().head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx=$approx exact=$exact")
  }

  test("sketches aggregate with bounded state under grouping") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.05).as("nd"))
      .collect()
    assert(rows.length === 3 && rows.forall(_.getLong(1) > 0))
  }
}
