package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "alpha", "x"), (2L, "beta", "y"), (3L, "gamma", "z"), (4L, "delta", "w")
  ).toDF("id", "body", "meta")

  private lazy val newSnap = Seq(
    (1L, "alpha", "x"),      // unchanged
    (2L, "beta2", "y"),      // changed (body)
    (4L, "delta", "W"),      // changed (meta only)
    (5L, "epsilon", "v")     // added; 3 removed
  ).toDF("id", "body", "meta")

  test("diff classifies added / removed / changed / unchanged") {
    val got = Snapshot.diff(oldSnap, newSnap, "id", Seq("body", "meta"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("separator prevents column-boundary ambiguity") {
    // ("ab","c") vs ("a","bc") concatenate identically without a separator
    val a = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val st = Snapshot.diff(a, b, "id", Seq("x", "y"))
      .select("status").head.getString(0)
    assert(st === "changed")
  }

  test("nulls are distinguished from empty strings and from shifted values") {
    // ("a", NULL) vs (NULL, "a"): bare concat_ws would skip the null and
    // hash both sides to md5("a") — the encoding must keep them apart
    val a = Seq((1L, Some("a"), Option.empty[String]),
      (2L, Option.empty[String], Option.empty[String])).toDF("id", "x", "y")
    val b = Seq((1L, Option.empty[String], Some("a")),
      (2L, Some(""), Some(""))).toDF("id", "x", "y")
    val got = Snapshot.diff(a, b, "id", Seq("x", "y"))
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
    // and a value equal to the NULL sentinel still differs from NULL
    val c = Seq((1L, Some(""))).toDF("id", "x")
    val n = Seq((1L, Option.empty[String])).toDF("id", "x")
    val st = Snapshot.diff(c, n, "id", Seq("x"))
      .select("status").head.getString(0)
    assert(st === "changed")
  }

  test("diffSummary reports counts and key envelopes per class") {
    val got = Snapshot.diffSummary(oldSnap, newSnap, "id", Seq("body", "meta"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("changed") === ((2L, 2L, 4L)))
    assert(got("added") === ((1L, 5L, 5L)))
    assert(got("removed") === ((1L, 3L, 3L)))
    assert(got("unchanged") === ((1L, 1L, 1L)))
  }

  test("hashes are carried for downstream routing") {
    val r = Snapshot.diff(oldSnap, newSnap, "id", Seq("body", "meta"))
      .filter($"id" === 5L).head
    assert(r.getAs[String]("old_hash") === null)
    assert(r.getAs[String]("new_hash") !== null)
  }
}
