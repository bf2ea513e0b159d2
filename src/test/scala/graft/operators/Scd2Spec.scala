package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: (Long, String, java.lang.Long, Long, java.lang.Long, Boolean)*) =
    rows.toDF("k", "seg", "score", "valid_from", "valid_to", "is_current")

  private def chg(rows: (Long, String, java.lang.Long)*) =
    rows.toDF("k", "seg", "score")

  private def applyBatch(d: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame, v: Long) =
    Scd2(d, c, "k", Seq("seg", "score"), v)
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else Long.box(r.getLong(2)),
        r.getLong(3),
        if (r.isNullAt(4)) null else Long.box(r.getLong(4)),
        r.getBoolean(5)))

  test("a real change closes the open version and inserts a fresh one") {
    val out = applyBatch(
      dim((1L, "A", Long.box(10L), 0L, null, true)),
      chg((1L, "B", Long.box(10L))), 5L)
    assert(out === Array(
      (1L, "A", Long.box(10L), 0L, Long.box(5L), false),
      (1L, "B", Long.box(10L), 5L, null, true)))
  }

  test("a no-op change and an absent key pass the current rows through") {
    val out = applyBatch(
      dim((1L, "A", Long.box(10L), 0L, null, true),
        (2L, "C", Long.box(7L), 0L, null, true)),
      chg((1L, "A", Long.box(10L))), 5L)
    assert(out === Array(
      (1L, "A", Long.box(10L), 0L, null, true),
      (2L, "C", Long.box(7L), 0L, null, true)))
  }

  test("an unseen key inserts its first open version") {
    val out = applyBatch(
      dim((1L, "A", Long.box(10L), 0L, null, true)),
      chg((9L, "N", Long.box(1L))), 3L)
    assert(out === Array(
      (1L, "A", Long.box(10L), 0L, null, true),
      (9L, "N", Long.box(1L), 3L, null, true)))
  }

  test("history rows pass through untouched; null transitions are null-safe") {
    // null → null on every tracked column is a no-op; null → value is a
    // real change (<=> semantics, no phantom versions)
    val d = dim(
      (1L, "OLD", Long.box(1L), 0L, Long.box(2L), false),
      (1L, "A", null, 2L, null, true),
      (2L, "B", null, 0L, null, true))
    val out = applyBatch(d, chg((1L, "A", Long.box(4L)), (2L, "B", null)), 6L)
    assert(out === Array(
      (1L, "OLD", Long.box(1L), 0L, Long.box(2L), false),
      (1L, "A", null, 2L, Long.box(6L), false),
      (1L, "A", Long.box(4L), 6L, null, true),
      (2L, "B", null, 0L, null, true)))
  }

  test("invariants over a multi-batch chain: one open version per key, contiguous spans") {
    val d0 = dim((1L, "A", Long.box(1L), 0L, null, true),
      (2L, "X", Long.box(2L), 0L, null, true))
    val d1 = Scd2(d0, chg((1L, "B", Long.box(1L)), (3L, "C", Long.box(3L))),
      "k", Seq("seg", "score"), 1L)
    val d2 = Scd2(d1, chg((1L, "B", Long.box(9L)), (2L, "X", Long.box(2L))),
      "k", Seq("seg", "score"), 2L)
    val rows = d2.orderBy("k", "valid_from").collect()
    val byKey = rows.groupBy(_.getLong(0))
    assert(byKey(1L).length === 3 && byKey(2L).length === 1 && byKey(3L).length === 1)
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_.getBoolean(5)) === 1, s"key $k open versions")
      // closed spans chain into the next valid_from
      vs.sortBy(_.getLong(3)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) === b.getLong(3), s"key $k gap")
        case _ =>
      }
    }
  }

  test("asOf reads the exact state visible at any version") {
    val d0 = dim((1L, "A", Long.box(1L), 0L, null, true))
    val d1 = Scd2(d0, chg((1L, "B", Long.box(1L)), (2L, "N", Long.box(2L))),
      "k", Seq("seg", "score"), 5L)
    def read(v: Long) = Scd2.asOf(d1, v).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // before the batch: only key 1's original version is visible
    assert(read(0L) === Seq((1L, "A")))
    assert(read(4L) === Seq((1L, "A")))
    // at and after the batch stamp: the new versions
    assert(read(5L) === Seq((1L, "B"), (2L, "N")))
    assert(read(99L) === Seq((1L, "B"), (2L, "N")))
    // asOf of the current state equals the is_current slice
    assert(Scd2.asOf(d1, 99L).count() ===
      d1.filter(col("is_current")).count())
  }

  test("every join is key-equi (Catalyst may split the full-outer; no cartesian)") {
    // The authored plan is ONE full-outer join; the optimizer pushes the
    // three branch predicates through it and specializes into ≤3 joins
    // over the SAME shuffled/broadcast children (exchange reuse) — all
    // still equi on the key, never a cartesian.
    val d0 = dim((1L, "A", Long.box(1L), 0L, null, true))
    val plan = Scd2(d0, chg((1L, "B", Long.box(1L))), "k", Seq("seg"), 1L)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    val joins = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.nonEmpty && joins.size <= 3, plan)
    joins.foreach(j => assert(j.contains("k#"), s"non-key join: $j"))
  }
}
