package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of graft's native expressions.
  *
  * Builds a sibling SparkSession (same JVM-singleton SparkContext) with
  * the extensions applied; the suite-shared default session is restored
  * afterwards and nothing is stopped (stopping would kill the shared
  * context for the other suites).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(spark)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  private val hofSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x)"

  test("dot_product is callable from SQL via withExtensions") {
    withExtSession { spark =>
      val r = spark.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r === 32.0)
    }
  }

  test("optimizer rewrites the HOF dot-product pattern to the native expression") {
    withExtSession { spark =>
      // arrays derive from a range column so constant folding can't
      // collapse the whole expression before/after the rewrite
      val df = spark.sql(
        s"SELECT $hofSql AS d FROM " +
          "(SELECT array(cast(id as double) + 1.0D, 2.0D) AS a, array(3.0D, 4.0D) AS b FROM range(1))")
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("dotproduct"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.collect().head.getDouble(0) === 11.0)
    }
  }

  test("rewrite preserves HOF edge semantics: mismatched lengths and null elements → NULL") {
    withExtSession { spark =>
      val mismatch = spark.sql(
        s"SELECT $hofSql AS d FROM VALUES (array(1.0D, 2.0D), array(3.0D)) AS t(a, b)")
      assert(mismatch.collect().head.isNullAt(0))
      val nullElem = spark.sql(
        s"SELECT $hofSql AS d FROM VALUES (array(1.0D, cast(null as double)), array(3.0D, 4.0D)) AS t(a, b)")
      assert(nullElem.collect().head.isNullAt(0))
    }
  }

  test("rewrite does NOT fire on float arrays (HOF multiplies in float precision)") {
    withExtSession { spark =>
      val df = spark.sql(
        "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (s, x) -> s + x) AS d " +
          "FROM VALUES (array(cast(1.5 as float)), array(cast(2.5 as float))) AS t(a, b)")
      assert(!df.queryExecution.optimizedPlan.toString.contains("dotproduct"),
        df.queryExecution.optimizedPlan.toString)
    }
  }
}
