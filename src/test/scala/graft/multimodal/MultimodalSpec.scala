package graft.multimodal

import graft.SparkSpec

/** Binary-payload plumbing: schema, metadata, per-partition decode shape. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "a much longer document body here"))
      .toDF("doc_id", "text")
  }

  test("payload column is binary with byte-accurate metadata") {
    val d = Multimodal.describePayload(Multimodal.withPayload(docs))
    val r = d.filter(d("doc_id") === 1L).select("media_meta.*").collect().head
    assert(r.getAs[Long]("n_bytes") === 11L)
    assert(r.getAs[String]("checksum").length === 32)
    assert(r.getAs[Int]("width") === 12 && r.getAs[Int]("height") === 12)
  }

  test("feature extraction runs per-partition and is deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.withPayload(docs))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.withPayload(docs))
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 === f2)
    assert(f1(1L).length === 16)
    assert(f1(1L).map(_.toDouble).sum === 11.0) // histogram mass = n_bytes
  }

  test("frame sampling explodes k frame rows per payload") {
    val frames = Multimodal.sampleFrames(Multimodal.withPayload(docs), 4)
    assert(frames.count() === 8)
    val offs = frames.filter(frames("doc_id") === 1L)
      .select("frame_offset").collect().map(_.getLong(0))
    assert(offs.sorted === Array(0L, 2L, 5L, 8L))
  }
}
