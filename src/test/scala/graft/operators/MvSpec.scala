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

  test("deltaJoin: incremental join view equals the full recompute (both sides changing)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // fact: (key, measure); dim: (key, tag). Deltas exercise every
    // quadrant: fact insert + retraction, dim update (retract+insert),
    // and a fact-delta row matching a dim-delta row (the dAxdB term).
    val aBase = Seq((1L, 10L, 1L), (1L, 20L, 1L), (2L, 30L, 1L), (3L, 40L, 1L))
      .toDF("k", "m", "w")
    val aDelta = Seq((2L, 5L, 1L), (1L, 20L, -1L), (4L, 7L, 1L))
      .toDF("k", "m", "w")
    val bBase = Seq((1L, "x", 1L), (2L, "y", 1L), (3L, "x", 1L))
      .toDF("bk", "tag", "w")
    val bDelta = Seq((3L, "x", -1L), (3L, "z", 1L), (4L, "z", 1L))
      .toDF("bk", "tag", "w")
    val view = Mv.counters(Mv.zJoin(aBase, bBase, "k", "bk"),
      Seq("tag"), "w", Seq("m"))
    val delta = Mv.counters(Mv.deltaJoin(aBase, aDelta, bBase, bDelta, "k", "bk"),
      Seq("tag"), "w", Seq("m"))
    val got = Mv.merge(view, delta, Seq("tag"), Seq("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // full recompute over the post-update states
    val aNew = Seq((1L, 10L), (2L, 30L), (3L, 40L), (2L, 5L), (4L, 7L)).toDF("k", "m")
    val bNew = Seq((1L, "x"), (2L, "y"), (3L, "z"), (4L, "z")).toDF("bk", "tag")
    val want = aNew.join(bNew, col("k") === col("bk"))
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("m").as("sm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("deltaJoin: a dim-side update moves the fact rows between groups exactly once") {
    import spark.implicits._
    val aBase = Seq((7L, 100L, 1L)).toDF("k", "m", "w")
    val aDelta = Seq.empty[(Long, Long, Long)].toDF("k", "m", "w")
    val bBase = Seq((7L, "old", 1L)).toDF("bk", "tag", "w")
    val bDelta = Seq((7L, "old", -1L), (7L, "new", 1L)).toDF("bk", "tag", "w")
    val view = Mv.counters(Mv.zJoin(aBase, bBase, "k", "bk"), Seq("tag"), "w", Seq("m"))
    val delta = Mv.counters(Mv.deltaJoin(aBase, aDelta, bBase, bDelta, "k", "bk"),
      Seq("tag"), "w", Seq("m"))
    val got = Mv.merge(view, delta, Seq("tag"), Seq("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("new", 1L, 100L)))
  }
}
