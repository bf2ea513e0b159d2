package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Structured Streaming: file-arrival micro-batches must produce the same
  * windowed aggregates as the batch twin over the same data.
  */
class EventStreamSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val dir = tmpDir("evstream")
    val lines = (0 until 100).map { i =>
      val ts = f"2024-01-01T0${i / 50}%d:${(i * 7) % 60}%02d:00.000Z"
      val et = Seq("view", "click", "error")(i % 3)
      s"""{"event_id": $i, "ts": "$ts", "user_id": ${i % 5}, "event_type": "$et", "value": ${i % 10}.25, "props": "{}"}"""
    }
    Files.write(Paths.get(dir, "batch-0.json"), lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("windowed streaming agg equals the batch twin") {
    val stream = EventStream.readJsonStream(spark, srcDir)
    val agg = EventStream.windowedAgg(stream, "1 hour", "2 hours")
    val q = agg.writeStream
      .format("memory").queryName("winagg")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("winagg")
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))

      val batch = spark.read.schema(EventStream.eventSchema).json(srcDir)
      val expected = EventStream.windowedAgg(batch)
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
      assert(got === expected)
      assert(got.map(_._3).sum === 100L)
    } finally q.stop()
  }

  test("session windows group events within the gap per user") {
    val batch = spark.read.schema(EventStream.eventSchema).json(srcDir)
    val sessions = EventStream.sessionCounts(batch, gapMinutes = 60).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === 100L)
    assert(sessions.forall(_.getAs[Long]("n_events") > 0))
  }

  test("mapGroupsWithState accumulates per-user counts across micro-batches") {
    val dir = tmpDir("evstate")
    def writeBatch(name: String, ids: Range): Unit =
      Files.write(Paths.get(dir, name), ids.map(i =>
        s"""{"event_id": $i, "ts": "2024-01-01T00:00:0${i % 10 / 10}Z", "user_id": ${i % 3}, "event_type": "view", "value": 1.0, "props": "{}"}""")
        .mkString("\n").getBytes("UTF-8"))
    writeBatch("b0.json", 0 until 30)
    val q = EventStream.runningUserCounts(EventStream.readJsonStream(spark, dir))
      .writeStream.format("memory").queryName("ustate").outputMode("update").start()
    try {
      q.processAllAvailable()
      writeBatch("b1.json", 30 until 60)
      q.processAllAvailable()
      // state carried across batches: 60 events / 3 users = 20 each
      val m = spark.table("ustate")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m === Map(0L -> 20L, 1L -> 20L, 2L -> 20L))
    } finally q.stop()
  }

  test("parquet sink drains available data with AvailableNow") {
    val out = tmpDir("evout")
    val ckpt = tmpDir("evckpt")
    val stream = EventStream.readJsonStream(spark, srcDir)
    val q = EventStream.parquetSink(
      stream.select("event_id", "event_type"), out, ckpt).start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.read.parquet(out).count() === 100L)
  }
}
