package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MvSpec extends SparkSpec {
  import spark.implicits._

  // changelog rows: (key, weight, measure)
  private def counters(rows: Seq[(String, Long, Long)]) =
    Mv.counters(rows.toDF("k", "w", "m"), Seq("k"), "w", Seq("m"))

  test("counters aggregates multiplicity and weighted sums per key") {
    val got = counters(Seq(("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L)))
      .as[(String, Long, Long)].collect()
      .map { case (k, n, m) => k -> ((n, m)) }.toMap
    assert(got === Map("a" -> ((2L, 30L)), "b" -> ((1L, 5L))))
  }

  test("merge of view + delta equals recompute over the merged changelog") {
    val base = Seq(("a", 1L, 10L), ("a", 1L, 20L), ("b", 1L, 5L), ("c", 1L, 7L))
    val delta = Seq(("a", 1L, 3L), ("d", 1L, 9L), ("b", -1L, 5L))
    val inc = Mv.merge(counters(base), counters(delta), Seq("k"), Seq("m"))
      .as[(String, Long, Long)].collect().toSet
    val full = counters(base ++ delta).filter(col("n") > 0)
      .as[(String, Long, Long)].collect().toSet
    assert(inc === full)
    assert(inc === Set(("a", 3L, 33L), ("c", 1L, 7L), ("d", 1L, 9L)))
  }

  test("retracting a key's last row deletes the key; delta-only keys insert") {
    val view = counters(Seq(("x", 1L, 4L)))
    val delta = counters(Seq(("x", -1L, 4L), ("y", 1L, 6L)))
    val got = Mv.merge(view, delta, Seq("k"), Seq("m"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("y", 1L, 6L)))
  }

  test("negative-weight retraction subtracts the weighted measure") {
    // retract one of two identical rows: count and sum both halve
    val view = counters(Seq(("a", 1L, 10L), ("a", 1L, 10L)))
    val delta = counters(Seq(("a", -1L, 10L)))
    val got = Mv.merge(view, delta, Seq("k"), Seq("m"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 10L)))
  }

  test("the merge join is key-equi full-outer (no cartesian)") {
    val view = counters(Seq(("a", 1L, 1L)))
    val delta = counters(Seq(("b", 1L, 2L)))
    val plan = Mv.merge(view, delta, Seq("k"), Seq("m"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
