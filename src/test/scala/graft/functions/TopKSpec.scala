package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Typed top-k aggregator: batch equivalence with window top-k, and
  * streaming usage with bounded per-group state.
  */
class TopKSpec extends SparkSpec {

  test("agg(TopK) equals window row_number top-k per group") {
    import spark.implicits._
    val data = (1 to 500).map(i =>
      (s"g${i % 7}", Scored((i * 37 % 211).toDouble, i.toLong)))
    val ds = data.toDF("g", "s").as[(String, Scored)]
    val viaAgg = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK(3).toColumn.name("top"))
      .collect().map { case (g, top) => g -> top.map(_.id) }.toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"s.score".desc, $"s.id")
    val viaWindow = data.toDF("g", "s")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"g", $"s.id")
      .collect().groupBy(_.getString(0))
      .map { case (g, rows) => g -> rows.map(_.getLong(1)).toSeq }
    assert(viaAgg.view.mapValues(_.toSeq).toMap === viaWindow)
  }

  test("TopK keeps state bounded in a streaming aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val q = mem.toDS()
      .map { case (g, score, id) => (g, Scored(score, id)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopK(2).toColumn.name("top"))
      .toDF("g", "top")
      .writeStream.format("memory").queryName("topkstream")
      .outputMode("update").start()
    try {
      mem.addData(("a", 1.0, 1L), ("a", 5.0, 2L), ("b", 9.0, 3L))
      q.processAllAvailable()
      mem.addData(("a", 7.0, 4L), ("a", 0.5, 5L))
      q.processAllAvailable()
      val top = spark.table("topkstream")
        .orderBy(desc("g")) // latest update rows included; take per-group max snapshot
        .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)))
        .groupBy(_._1).map { case (g, vs) => g -> vs.last._2 }
      // group a saw scores 1,5,7,0.5 → top-2 ids by score = (4, 2)
      assert(top("a") === Seq(4L, 2L))
    } finally q.stop()
  }
}
