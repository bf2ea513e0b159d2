package graft.operators

import graft.SparkSpec

/** As-of join semantics: latest prior match, inclusive equality, left
  * rows without a prior match survive with null.
  */
class AsOfSpec extends SparkSpec {

  test("asofJoin picks the latest right row with ts <= left ts per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), (2L, "k1", 205L), (3L, "k2", 50L), (4L, "k2", 300L))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("k1", 90L, "a"), ("k1", 100L, "b"), ("k1", 200L, "c"),
      ("k2", 60L, "x"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got === Map(
      1L -> Some("b"), // equal ts is inclusive
      2L -> Some("c"), // latest prior, not first
      3L -> None,      // no right row at or before 50
      4L -> Some("x")))
  }

  test("asofJoinForward picks the earliest right row with ts >= left ts per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", 100L), (2L, "k1", 205L), (3L, "k2", 50L), (4L, "k2", 300L))
      .toDF("id", "k", "ts")
    val right = Seq(
      ("k1", 100L, "b"), ("k1", 200L, "c"), ("k1", 250L, "d"),
      ("k2", 60L, "x"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoinForward(left, right, "k", "ts", "v")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got === Map(
      1L -> Some("b"), // equal ts is inclusive
      2L -> Some("d"), // earliest following, not latest
      3L -> Some("x"),
      4L -> None))     // no right row at or after 300
  }

  test("forward ties on (key, ts) resolve deterministically to the smallest value") {
    import spark.implicits._
    val left = Seq((1L, "k1", 100L)).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", 110L, "b"), ("k1", 110L, "c"), ("k1", 110L, "a"))
      .toDF("k", "ts", "v")
    for (parts <- Seq(1, 3, 7)) {
      val got = AsOf.asofJoinForward(left, right.repartition(parts), "k", "ts", "v")
        .collect().map(_.getString(3))
      assert(got === Array("a"), s"parts=$parts")
    }
  }

  test("duplicate (key, ts) right rows resolve deterministically to the greatest value") {
    import spark.implicits._
    val left = Seq((1L, "k1", 100L)).toDF("id", "k", "ts")
    val right = Seq( // three right rows tied at ts=90 — winner must be fixed
      ("k1", 90L, "b"), ("k1", 90L, "c"), ("k1", 90L, "a"))
      .toDF("k", "ts", "v")
    // repartition shuffles the physical row order; result must not change
    for (parts <- Seq(1, 3, 7)) {
      val got = AsOf.asofJoin(left, right.repartition(parts), "k", "ts", "v")
        .collect().map(_.getString(3))
      assert(got === Array("c"), s"parts=$parts")
    }
  }
}
