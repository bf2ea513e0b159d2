package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // entity "a": events on day 2 (two events) and day 4; "b": day 1 only
  private lazy val events = Seq(
    ("a", "2024-03-02 10:00:00", 5L),
    ("a", "2024-03-02 11:00:00", 7L),
    ("a", "2024-03-04 09:00:00", 100L),
    ("b", "2024-03-01 23:59:59", 1L)
  ).toDF("e", "ts", "v").withColumn("ts", to_timestamp($"ts"))

  private lazy val filled = Resample.gapFillDaily(
    events, "e", "ts", $"v", c => sum(c).cast("long"),
    "2024-03-01", "2024-03-05")

  test("spine covers every entity-day; fills carry the last observation forward") {
    val a = filled.filter($"e" === "a").orderBy("day")
      .select("observed", "filled").collect()
      .map(r => (r.getBoolean(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(a.toSeq === Seq(
      (false, None),       // 03-01: before first observation → null
      (true, Some(12L)),   // 03-02: 5+7 observed
      (false, Some(12L)),  // 03-03: gap, forward-filled
      (true, Some(100L)),  // 03-04
      (false, Some(100L))))// 03-05: gap, forward-filled
  }

  test("entities never leak fills into each other") {
    val b = filled.filter($"e" === "b").orderBy("day")
      .select("filled").collect().map(r => Option(r.get(0)))
    assert(b.forall(_ === Some(1L)))
    assert(filled.filter($"e" === "b").count() === 5)
  }

  test("pre-start state seeds the fill; post-end events are excluded") {
    val ev = Seq(
      ("c", "2024-02-27 08:00:00", 42L),  // pre-start: becomes the seed
      ("c", "2024-02-28 09:00:00", 77L),  // later pre-start obs wins the seed
      ("c", "2024-03-03 10:00:00", 9L),
      ("c", "2024-03-09 10:00:00", 1000L) // after end: must not appear or fill
    ).toDF("e", "ts", "v").withColumn("ts", to_timestamp($"ts"))
    val got = Resample.gapFillDaily(ev, "e", "ts", $"v", c => sum(c).cast("long"),
      "2024-03-01", "2024-03-05")
      .orderBy("day")
      .select("observed", "filled").collect()
      .map(r => (r.getBoolean(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      (false, Some(77L)),  // 03-01: filled from the last pre-start observation
      (false, Some(77L)),  // 03-02
      (true, Some(9L)),    // 03-03: in-window observation takes over
      (false, Some(9L)),   // 03-04
      (false, Some(9L))))  // 03-05: the 03-09 event never leaks in
  }

  test("day_agg is null exactly on unobserved days") {
    val rows = filled.collect()
    rows.foreach { r =>
      assert(r.getBoolean(2) === (r.get(3) != null))
    }
  }
}
