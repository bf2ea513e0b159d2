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
    assert(r.getAs[String]("media_type") === "application/octet-stream")
    assert(r.getAs[Int]("width") === 12 && r.getAs[Int]("height") === 12)
  }

  test("PNG payloads get REAL dimensions from the IHDR header, no library") {
    import spark.implicits._
    // minimal PNG prefix: signature + IHDR length + type + 256×128 dims
    val png: Array[Byte] = (
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++ // signature
        Seq(0x00, 0x00, 0x00, 0x0D) ++                        // IHDR length
        "IHDR".getBytes("US-ASCII").map(_.toInt) ++
        Seq(0x00, 0x00, 0x01, 0x00) ++                        // width 256
        Seq(0x00, 0x00, 0x00, 0x80)                           // height 128
      ).map(_.toByte).toArray
    val notPng = "just bytes".getBytes("UTF-8")
    val d = Multimodal.describePayload(
      Seq((1L, png), (2L, notPng)).toDF("doc_id", "payload"))
      .select($"doc_id", $"media_meta.media_type", $"media_meta.width", $"media_meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(d(1L) === (("image/png", 256, 128)))
    assert(d(2L)._1 === "application/octet-stream") // stub fallback
  }

  test("GIF payloads parse little-endian dimensions from the header") {
    import spark.implicits._
    // GIF89a logical-screen 320×200: 0x0140 LE = 40 01, 0x00C8 LE = C8 00
    val gif: Array[Byte] = ("GIF89a".getBytes("US-ASCII").map(_.toInt) ++
      Seq(0x40, 0x01, 0xC8, 0x00)).map(_.toByte).toArray
    val d = Multimodal.describePayload(Seq((1L, gif)).toDF("doc_id", "payload"))
      .select($"media_meta.media_type", $"media_meta.width", $"media_meta.height")
      .collect().head
    assert((d.getString(0), d.getInt(1), d.getInt(2)) === (("image/gif", 320, 200)))
  }

  test("BMP payloads parse little-endian i32 dimensions") {
    import spark.implicits._
    // "BM" + 12 filler bytes + 4-byte header-size + width 1024 LE + height 768 LE
    val bmp: Array[Byte] = ("BM".getBytes("US-ASCII").map(_.toInt) ++
      Seq.fill(12)(0x00) ++ Seq(0x28, 0x00, 0x00, 0x00) ++
      Seq(0x00, 0x04, 0x00, 0x00) ++ Seq(0x00, 0x03, 0x00, 0x00))
      .map(_.toByte).toArray
    val d = Multimodal.describePayload(Seq((1L, bmp)).toDF("doc_id", "payload"))
      .select($"media_meta.media_type", $"media_meta.width", $"media_meta.height")
      .collect().head
    assert((d.getString(0), d.getInt(1), d.getInt(2)) === (("image/bmp", 1024, 768)))
  }

  test("top-down BMP (negative i32 height) survives ANSI mode") {
    import spark.implicits._
    // height -768 = 0xFFFFFD00 LE: byte3 = 0xFF — Int-space assembly of
    // byte3 * (1<<24) would overflow and throw under ANSI mode
    val bmp: Array[Byte] = ("BM".getBytes("US-ASCII").map(_.toInt) ++
      Seq.fill(12)(0x00) ++ Seq(0x28, 0x00, 0x00, 0x00) ++
      Seq(0x00, 0x04, 0x00, 0x00) ++ Seq(0x00, 0xFD, 0xFF, 0xFF))
      .map(_.toByte).toArray
    val d = Multimodal.describePayload(Seq((1L, bmp)).toDF("doc_id", "payload"))
      .select($"media_meta.media_type", $"media_meta.width", $"media_meta.height")
      .collect().head
    assert((d.getString(0), d.getInt(1), d.getInt(2)) === (("image/bmp", 1024, -768)))
  }

  test("WAV payloads get audio metadata (rate/channels), NULL image dims") {
    import spark.implicits._
    val wav = Audio.encodeWavPcm16(16000, 2, Array.tabulate(64)(i => i.toShort))
    val d = Multimodal.describePayload(
      Seq((1L, wav), (2L, "plain".getBytes)).toDF("doc_id", "payload"))
      .select($"doc_id", $"media_meta.media_type", $"media_meta.width",
        $"media_meta.sample_rate", $"media_meta.channels")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(d(1L) === (("audio/wav", None, Some(16000), Some(2))))
    assert(d(2L)._1 === "application/octet-stream")
    assert(d(2L)._3 === None && d(2L)._4 === None)
  }

  test("JPEG payloads parse dimensions via the SOF segment walk") {
    import spark.implicits._
    // SOI, APP0 (16 bytes), SOF0 with 480×640: a realistic marker layout
    val jpeg: Array[Byte] = (
      Seq(0xFF, 0xD8) ++                              // SOI
        Seq(0xFF, 0xE0, 0x00, 0x10) ++ Seq.fill(14)(0x00) ++ // APP0 len 16
        Seq(0xFF, 0xC0, 0x00, 0x11, 0x08,             // SOF0 len 17, prec 8
          0x01, 0xE0,                                 // height 480
          0x02, 0x80,                                 // width 640
          0x03) ++ Seq.fill(10)(0x00)
      ).map(_.toByte).toArray
    assert(Multimodal.jpegDimensions(jpeg) === Some((640, 480)))
    assert(Multimodal.jpegDimensions("not a jpeg".getBytes) === None)
    assert(Multimodal.jpegDimensions(Array[Byte](0xFF.toByte, 0xD8.toByte)) === None)
    val d = Multimodal.withJpegDimensions(
      Seq((1L, jpeg), (2L, "plain".getBytes)).toDF("doc_id", "payload"))
      .select($"doc_id", $"jpeg_width", $"jpeg_height").collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(d(1L) === ((Some(640), Some(480))))
    assert(d(2L) === ((None, None)))
  }

  test("BMP 24-bit encode/decode round-trips pixels exactly (padding + both row orders)") {
    // width 3 → row size 12 with 3 pad bytes: exercises padding; run both
    // bottom-up and top-down storage against the same logical image
    def pix(x: Int, y: Int): (Int, Int, Int) = (10 * x + y, 100 + x, 200 - 7 * y)
    Seq(false, true).foreach { topDown =>
      val bytes = Multimodal.encodeBmp24(3, 5, pix, topDown)
      val img = Multimodal.decodeBmp24(bytes).get
      assert(img.width === 3 && img.height === 5, s"topDown=$topDown")
      for (y <- 0 until 5; x <- 0 until 3) {
        val p = img.rgb(y * 3 + x)
        val (r, g, b) = pix(x, y)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((r, g, b)),
          s"pixel ($x,$y) topDown=$topDown")
      }
    }
  }

  test("decodeBmp24 rejects non-BMP, compressed, and truncated payloads") {
    assert(Multimodal.decodeBmp24(null) === None)
    assert(Multimodal.decodeBmp24("not a bitmap at all, just text bytes padded to 54+..."
      .getBytes("UTF-8")) === None)
    val good = Multimodal.encodeBmp24(4, 4, (_, _) => (1, 2, 3))
    assert(Multimodal.decodeBmp24(good).isDefined)
    assert(Multimodal.decodeBmp24(good.take(40)) === None)      // truncated header
    assert(Multimodal.decodeBmp24(good.take(60)) === None)      // truncated pixels
    val wrongBpp = good.clone(); wrongBpp(28) = 8               // 8-bpp palette
    assert(Multimodal.decodeBmp24(wrongBpp) === None)
    val compressed = good.clone(); compressed(30) = 1           // BI_RLE8
    assert(Multimodal.decodeBmp24(compressed) === None)
  }

  test("seeded fuzz: random dims/pixels/row-order BMPs round-trip exactly") {
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { i =>
      val w = 1 + rnd.nextInt(16); val h = 1 + rnd.nextInt(8)
      val px = Array.fill(w * h)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val bytes = Multimodal.encodeBmp24(w, h, (x, y) => px(y * w + x),
        topDown = rnd.nextBoolean())
      val img = Multimodal.decodeBmp24(bytes).getOrElse(fail(s"iteration $i"))
      assert(img.width === w && img.height === h, s"iteration $i")
      img.rgb.zip(px.map { case (r, g, b) => (r << 16) | (g << 8) | b })
        .foreach { case (got, want) => assert(got === want, s"iteration $i") }
    }
  }

  test("decodeBmp24 returns None (never throws) on overflow-crafted headers") {
    val good = Multimodal.encodeBmp24(4, 4, (_, _) => (1, 2, 3))
    def withLe32(pos: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      (0 until 4).foreach(i => b(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
      b
    }
    // width*3 and width*height overflow int space if computed naively
    assert(Multimodal.decodeBmp24(withLe32(18, Int.MaxValue)) === None)
    assert(Multimodal.decodeBmp24(withLe32(18, 0x40000000)) === None)
    // Int.MinValue height has no int abs
    assert(Multimodal.decodeBmp24(withLe32(22, Int.MinValue)) === None)
    // pixel-data offset beyond the payload
    assert(Multimodal.decodeBmp24(withLe32(10, Int.MaxValue)) === None)
  }

  test("extractFeatures computes REAL mean RGB from decoded BMP pixels") {
    import spark.implicits._
    // constant-color 4×2 image → means are exact
    val bmp = Multimodal.encodeBmp24(4, 2, (_, _) => (50, 100, 150))
    val f = Multimodal.extractFeatures(Seq((1L, bmp)).toDF("doc_id", "payload"))
      .select("features").collect().head.getSeq[Float](0)
    assert(f(0) === 50f && f(1) === 100f && f(2) === 150f)
    // luma = (50*299 + 100*587 + 150*114)/1000 = 90 → bin 3+90*13/256 = 7
    assert(f(3 + 90 * 13 / 256) === 8f)
    assert(f.map(_.toDouble).sum === 50 + 100 + 150 + 8.0)
  }

  test("extractFeatures decodes COMPRESSED payloads too: PNG, JPEG and GIF pixel features") {
    import spark.implicits._
    // same constant color through all three codecs; the JPEG row's
    // expectation pays exactly the integer YCbCr round-trip (here
    // (50,100,150) → (50,100,149)), nothing else — the DCT path is
    // bit-exact on a constant image
    val (r0, g0, b0) = (50, 100, 150)
    val (yy, cb, cr) = Jpeg.rgbToYcc(r0, g0, b0)
    val (jr, jg, jb) = Jpeg.yccToRgb(yy, cb, cr)
    val bmp = Multimodal.encodeBmp24(8, 8, (_, _) => (r0, g0, b0))
    val png = Png.encodePng(8, 8, 2, (_, _) => (r0, g0, b0, 255), _ % 5)
    val jpg = Jpeg.encodeJpegColor(8, 8, (_, _) => (r0, g0, b0),
      subsample420 = false)
    val gif = Gif.encodeGif(8, 8, Array((r0 << 16) | (g0 << 8) | b0), (_, _) => 0)
    val rows = Multimodal.extractFeatures(
      Seq((1L, bmp), (2L, png), (3L, jpg), (4L, gif)).toDF("doc_id", "payload"))
      .orderBy("doc_id")
      .select("features").collect().map(_.getSeq[Float](0))
    Seq((rows(0), (r0, g0, b0)), (rows(1), (r0, g0, b0)),
      (rows(2), (jr, jg, jb)), (rows(3), (r0, g0, b0))).foreach { case (f, (er, eg, eb)) =>
      assert((f(0), f(1), f(2)) === ((er.toFloat, eg.toFloat, eb.toFloat)))
      val luma = (er * 299 + eg * 587 + eb * 114) / 1000
      assert(f(3 + luma * 13 / 256) === 64f) // all 64 px in one luma bin
    }
  }

  test("syntheticBmpStats matches a direct computation from the pixel formula") {
    import spark.implicits._
    val out = Multimodal.syntheticBmpStats(
      Seq(2L, 3L).toDF("doc_id"), "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(2L, 3L).foreach { id =>
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val px = for (y <- 0 until h; x <- 0 until w) yield
        (((id + 7 * x + 13 * y) % 256, (2 * id + 11 * x + 3 * y) % 256,
          (3 * id + 5 * x + 17 * y) % 256), x + w * y)
      val r = out(id)
      assert(r.getLong(1) === w && r.getLong(2) === h && r.getLong(3) === w * h)
      assert(r.getLong(4) === px.map(_._1._1).sum)
      assert(r.getLong(5) === px.map(_._1._2).sum)
      assert(r.getLong(6) === px.map(_._1._3).sum)
      assert(r.getLong(7) === px.map { case ((pr, pg, pb), i) =>
        i * ((pr * 299 + pg * 587 + pb * 114) / 1000) }.sum)
    }
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

  test("aHash12: flat image hashes to 0 (no block strictly above the mean)") {
    assert(Multimodal.aHash12(4, 3, Array.fill(12)(100)) === 0L)
    assert(Multimodal.aHash12(8, 6, Array.fill(48)(0)) === 0L)
  }

  test("aHash12: left-bright image sets exactly the left block columns") {
    // 8x3: x < 4 bright (200), x >= 4 dark (0) → blocks bi=0,1 above
    // the mean in every row bj; bi=2,3 below
    val luma = Array.tabulate(24)(i => if (i % 8 < 4) 200 else 0)
    val h = Multimodal.aHash12(8, 3, luma)
    val expected = (0 until 3).flatMap(bj => Seq(0, 1).map(bi => 1L << (bj * 4 + bi))).sum
    assert(h === expected)
  }

  test("aHash12: bit index is bj*4+bi (single bright block pins the layout)") {
    // 4x3, one pixel per block: only (x=2, y=1) bright → bit bj=1,bi=2 → 6
    val luma = Array.tabulate(12)(i => if (i == 1 * 4 + 2) 255 else 0)
    assert(Multimodal.aHash12(4, 3, luma) === (1L << 6))
  }

  test("syntheticBmpAHash: deterministic, 12-bit range, popcount consistent") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val rows = Multimodal.syntheticBmpAHash(ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.length === 40)
    rows.foreach { case (id, hash, nOn) =>
      assert(hash >= 0L && hash < 4096L, s"id $id hash $hash out of 12-bit range")
      assert(java.lang.Long.bitCount(hash).toLong === nOn, s"id $id popcount")
    }
    val again = Multimodal.syntheticBmpAHash(ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // hashes must actually discriminate across ids (not collapse to one value)
    assert(rows.map(_._2).distinct.length > 5)
  }

  test("imageNearDupPairs: pigeonhole banding ≡ brute-force hamming pairs") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val sig = Multimodal.syntheticBmpAHash(ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    val expect = (for {
      (ia, ha) <- sig; (ib, hb) <- sig if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb).toLong if d <= 2
    } yield (ia, ib, d)).toSeq.sorted
    val got = Multimodal.imageNearDupPairs(ids, "doc_id", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got === expect) // banding loses no pair, adds no false positive
    assert(expect.nonEmpty, "degenerate fixture: no near-dup pairs to check")
  }

  test("image clusters = brute-force union-find over hamming pairs") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val sig = Multimodal.syntheticBmpAHash(ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    // brute-force union-find with min-id labels
    val parent = scala.collection.mutable.Map(sig.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (ia, ha) <- sig; (ib, hb) <- sig
          if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2 } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = sig.map(s => (s._1, find(s._1))).toSeq.sorted
    val got = graft.operators.Components.clusters(
        ids, "doc_id",
        Multimodal.imageNearDupPairs(ids, "doc_id", maxHamming = 2),
        "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === expect)
  }

  test("syntheticBmpResize: identity target dims reproduce the source sums") {
    import spark.implicits._
    // id 0 has source dims exactly 4×3, so the 4×3 "resize" is identity
    // and must reproduce syntheticBmpStats' channel sums and wluma
    val stats = Multimodal.syntheticBmpStats(Seq(0L).toDF("doc_id"), "doc_id").head()
    val rz = Multimodal.syntheticBmpResize(Seq(0L).toDF("doc_id"), "doc_id", 4, 3).head()
    Seq("sum_r", "sum_g", "sum_b", "wluma").foreach { c =>
      assert(rz.getAs[Long](c) === stats.getAs[Long](c), c)
    }
  }

  test("syntheticBmpResize: downsample picks the floor-mapped source pixels") {
    import spark.implicits._
    // id 4: w = 4+4%5 = 8, h = 3+4%4 = 3 → tx∈0..3 maps to sx = tx*8/4 = 2tx
    val rz = Multimodal.syntheticBmpResize(Seq(4L).toDF("doc_id"), "doc_id", 4, 3).head()
    def ch(f: (Long, Int, Int) => Long): Long =
      (for (ty <- 0 until 3; tx <- 0 until 4) yield f(4L, 2 * tx, ty)).sum
    assert(rz.getAs[Long]("sum_r") === ch((id, x, y) => (id + 7 * x + 13 * y) % 256))
    assert(rz.getAs[Long]("sum_g") === ch((id, x, y) => (2 * id + 11 * x + 3 * y) % 256))
    assert(rz.getAs[Long]("sum_b") === ch((id, x, y) => (3 * id + 5 * x + 17 * y) % 256))
    assert(rz.getAs[Long]("src_w") === 8L && rz.getAs[Long]("src_h") === 3L)
  }
}
