package graft.multimodal

import graft.SparkSpec

/** Y4M codec: byte-exact round trips, header-tag and FRAME-parameter
  * tolerance, and honest rejection of everything the decoder can't
  * decode (truncation, unsupported colourspace, clobbered magic).
  */
class VideoSpec extends SparkSpec {

  private def grad(t: Int, x: Int, y: Int): (Int, Int, Int) =
    ((t + 2 * x + 3 * y) % 256, (5 * t + x) % 256, (7 * t + y) % 256)

  test("round trip is pixel-exact across frames and planes") {
    val enc = Video.encodeY4m(5, 4, 3, grad)
    val vid = Video.decodeY4m(enc).get
    assert(vid.width === 5 && vid.height === 4 && vid.frames.length === 3)
    assert(vid.fpsNum === 25 && vid.fpsDen === 1)
    for (t <- 0 until 3; y <- 0 until 4; x <- 0 until 5) {
      val (py, pu, pv) = grad(t, x, y)
      val i = x + 5 * y
      assert((vid.frames(t).y(i) & 0xff) === py, s"Y($t,$x,$y)")
      assert((vid.frames(t).u(i) & 0xff) === pu, s"U($t,$x,$y)")
      assert((vid.frames(t).v(i) & 0xff) === pv, s"V($t,$x,$y)")
    }
  }

  test("1x1 single-frame minimum and 255-value masking") {
    val vid = Video.decodeY4m(Video.encodeY4m(1, 1, 1, (_, _, _) => (511, -1, 256))).get
    assert(vid.frames.length === 1)
    // encoder masks to a byte: 511 & 0xff = 255, -1 & 0xff = 255, 256 & 0xff = 0
    assert((vid.frames(0).y(0) & 0xff) === 255)
    assert((vid.frames(0).u(0) & 0xff) === 255)
    assert((vid.frames(0).v(0) & 0xff) === 0)
  }

  test("custom frame rate survives the header round trip") {
    val vid = Video.decodeY4m(Video.encodeY4m(2, 2, 1, grad, fpsNum = 30000, fpsDen = 1001)).get
    assert(vid.fpsNum === 30000 && vid.fpsDen === 1001)
  }

  test("spec-legal variations decode: extra header tags, FRAME parameters") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val plane = Array.tabulate(6)(i => i.toByte)
    // X-comment tags in the stream header and a parameter on the FRAME
    // marker are both allowed by the spec
    val bytes = "YUV4MPEG2 W3 H2 F25:1 Ip A1:1 C444 XCOMMENT\n".getBytes(ascii) ++
      "FRAME Ip\n".getBytes(ascii) ++ plane ++ plane ++ plane
    val vid = Video.decodeY4m(bytes).get
    assert(vid.width === 3 && vid.height === 2 && vid.frames.length === 1)
    assert(vid.frames(0).y.toSeq === plane.toSeq)
    assert(vid.frames(0).v.toSeq === plane.toSeq)
  }

  test("rejects garbage, truncation, and unsupported layouts without throwing") {
    val good = Video.encodeY4m(4, 3, 2, grad)
    assert(Video.decodeY4m(null).isEmpty)
    assert(Video.decodeY4m(Array.emptyByteArray).isEmpty)
    assert(Video.decodeY4m("not a video at all".getBytes("US-ASCII")).isEmpty)
    // clobbered magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(Video.decodeY4m(bad).isEmpty)
    // truncated mid-plane and mid-marker
    assert(Video.decodeY4m(good.dropRight(1)).isEmpty)
    assert(Video.decodeY4m(good.take(good.length - 3 * 12 - 3)).isEmpty)
    // header only, no frames
    val headerEnd = good.indexOf('\n'.toByte) + 1
    assert(Video.decodeY4m(good.take(headerEnd)).isEmpty)
    // C420 plane layout is a different size — must reject, not misread
    val c420 = new String(good, "US-ASCII").replace("C444", "C420").getBytes("US-ASCII")
    assert(Video.decodeY4m(c420).isEmpty)
    // zero/absent dimensions
    assert(Video.decodeY4m("YUV4MPEG2 W0 H2 C444\nFRAME\n".getBytes("US-ASCII")).isEmpty)
    assert(Video.decodeY4m("YUV4MPEG2 H2 C444\nFRAME\n".getBytes("US-ASCII")).isEmpty)
  }

  test("isY4m column sniff matches real payloads only") {
    import spark.implicits._
    val df = Seq(
      ("y4m", Video.encodeY4m(2, 2, 1, grad)),
      ("text", "hello world".getBytes("UTF-8"))).toDF("kind", "payload")
    val got = df.select($"kind", Video.isY4m($"payload").as("is"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("y4m" -> true, "text" -> false))
  }

  test("vHash16 recovers the planted key exactly, all ids distinct") {
    import spark.implicits._
    val got = Video.syntheticVideoVHash((0L until 100L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 100L).foreach { id =>
      val key = ((id % 256) | ((~(id % 256) & 0xff) << 8)) & 0xffff
      assert(got(id) === key, s"id=$id")
    }
    assert(got.values.toSet.size === 100)
    // the complement half pins popcount at exactly 8
    assert(got.values.forall(java.lang.Long.bitCount(_) == 8))
  }

  test("vHash16 on a flat video is all-zero (no cell strictly above the mean)") {
    val vid = Video.decodeY4m(Video.encodeY4m(4, 4, 4, (_, _, _) => (100, 0, 0))).get
    assert(Video.vHash16(vid) === 0L)
  }

  test("video near-dup banding equals the brute-force pair set") {
    import spark.implicits._
    val df = (0L until 100L).toDF("doc_id")
    val banded = Video.videoNearDupPairs(df, "doc_id", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = Video.syntheticVideoVHash(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- 0L until 100L; b <- (a + 1) until 100L
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("syntheticY4mFrameStats matches a direct closed-form computation") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 42L, 99L)
    val got = Video.syntheticY4mFrameStats(ids.toDF("doc_id"), "doc_id", k = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.toSeq.drop(2).map(_.asInstanceOf[Long]))
      .toMap
    ids.foreach { id =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt; val nf = (3 + id % 5).toInt
      (0 until 4).foreach { j =>
        val t = j * nf / 4
        var sy = 0L; var su = 0L; var sv = 0L; var wy = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val py = (id + 7 * x + 13 * y + 29 * t) % 256
          sy += py
          su += (2 * id + 11 * x + 3 * y + 19 * t) % 256
          sv += (3 * id + 5 * x + 17 * y + 23 * t) % 256
          wy += (x + w * y) * py
        }
        assert(got((id, j.toLong)) ===
          Seq(t.toLong, w.toLong, h.toLong, nf.toLong, sy, su, sv, wy), s"id=$id frame=$j")
      }
    }
  }

  test("scene segmentation recovers the planted bit-run structure through the codec") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val scenes = Video.scenesFromLuma(
        Video.syntheticY4mSceneFrames(ids, "doc_id"), "doc_id")
      .orderBy("doc_id", "scene_no")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // closed-form reference: scenes = maximal runs of equal id bits
    (0L until 40L).foreach { id =>
      val nf = (6 + id % 5).toInt
      val bits = (0 until nf).map(t => (id >> t) & 1L)
      val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = 0
      (1 until nf).foreach { t =>
        if (bits(t) != bits(t - 1)) { expected += ((start.toLong, t - 1L)); start = t }
      }
      expected += ((start.toLong, nf - 1L))
      val got = scenes.filter(_._1 == id).sortBy(_._2)
        .map(s => (s._3, s._4)).toSeq
      assert(got === expected.toSeq, s"id=$id bits=$bits")
      // per-scene frame counts partition the video exactly
      assert(scenes.filter(_._1 == id).map(_._5).sum === nf.toLong)
    }
    // hand-check id 5 (bits 1,0,1,0,0,0): scenes [0,0][1,1][2,2][3,5]
    assert(scenes.filter(_._1 == 5L).map(s => (s._3, s._4)).toSeq ===
      Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 5L)))
  }
}
