package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Jpeg]] — the zero-dependency baseline JPEG codec. The decoder is
  * validated three independent ways: a HAND-assembled entropy stream
  * (bit-level Annex-K Huffman arithmetic worked out by hand, decoded
  * without the encoder in the loop), cross-decoding against the JDK's
  * own ImageIO JPEG reader (a libjpeg-derived implementation — if our
  * Huffman tables, marker layout or fixed-point color constants were
  * wrong, a real-world decoder would disagree), and closed-form
  * round-trips on block-constant images where the DCT path is
  * bit-exact.
  */
class JpegSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decoder inverts a HAND-assembled DC-only entropy stream") {
    // One 8×8 grayscale block, constant 200, all-ones quant.
    // DC = 8·(200−128) = 576, category 10 → DC-lum code 11111110 (8 bits)
    // + magnitude 1001000000 (576 = 512+64), then EOB = 1010 (AC-lum
    // 0x00, 4 bits); 22 bits, 1-padded to 24 = FE 90 2B — worked out by
    // hand from the Annex K canonical code construction.
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
      val len = payload.length + 2
      Array(0xff.toByte, marker.toByte, (len >> 8).toByte, len.toByte) ++ payload
    }
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    val acBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    val acVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a) ++ (0 until 123).map(i => 0x16 + i) // tail only pads counts
    val payload =
      Array(0xff, 0xd8).map(_.toByte) ++
        seg(0xdb, (0.toByte +: Array.fill(64)(1.toByte)).toArray) ++
        seg(0xc0, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0)) ++
        seg(0xc4, (0x00.toByte +: (dcBits.map(_.toByte) ++
          (0 to 11).map(_.toByte))).toArray) ++
        seg(0xc4, (0x10.toByte +: (acBits.map(_.toByte) ++
          acVals.map(_.toByte))).toArray) ++
        seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0)) ++
        Array(0xfe, 0x90, 0x2b).map(_.toByte) ++ // the hand-built bits
        Array(0xff, 0xd9).map(_.toByte)
    val img = Jpeg.decodeJpeg(payload).get
    assert(img.width === 8 && img.height === 8 && img.gray)
    img.rgb.foreach(p => assert(p === ((200 << 16) | (200 << 8) | 200)))
  }

  private def blockColor(id: Long)(bx: Int, by: Int): (Int, Int, Int) =
    (((id + 11 * bx + 17 * by) % 256).toInt,
      ((3 * id + 7 * bx + 5 * by) % 256).toInt,
      ((2 * id + 13 * bx + 3 * by) % 256).toInt)

  test("block-constant color images round-trip to the closed form (4:4:4 and 4:2:0)") {
    Seq(false, true).foreach { sub =>
      val (w, h) = (48, 32)
      val bytes = Jpeg.encodeJpegColor(w, h,
        (x, y) => blockColor(7L)(x / 16, y / 16), subsample420 = sub)
      val img = Jpeg.decodeJpeg(bytes).get
      assert(img.width === w && img.height === h && !img.gray)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = blockColor(7L)(x / 16, y / 16)
        val (yy, cb, cr) = Jpeg.rgbToYcc(r, g, b)
        val (er, eg, eb) = Jpeg.yccToRgb(yy, cb, cr)
        val p = img.rgb(y * w + x)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((er, eg, eb)),
          s"pixel ($x,$y) sub=$sub")
      }
    }
  }

  test("cross-decoder check: the JDK's own ImageIO JPEG reader agrees pixel-for-pixel") {
    // ImageIO's reader is libjpeg-derived: a wrong Huffman table, marker
    // layout, stuffing bug or color constant in OUR encoder/decoder
    // would make a real-world decoder disagree. Gray (multi-block),
    // color 4:4:4 (multi-block), and 4:2:0 (single block — ImageIO's
    // fancy chroma upsampling only provably equals nearest on images
    // with no chroma discontinuity).
    def viaImageIo(bytes: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val gray = Jpeg.encodeJpegGray(24, 16, (x, y) => 30 + 8 * (x / 8) + 40 * (y / 8))
    val g1 = Jpeg.decodeJpeg(gray).get
    val g2 = viaImageIo(gray)
    assert(g2.getWidth === 24 && g2.getHeight === 16)
    // raw raster samples: getRGB on TYPE_BYTE_GRAY would push the
    // sample through a linear-gray→sRGB transform
    for (y <- 0 until 16; x <- 0 until 24)
      assert((g1.rgb(y * 24 + x) & 0xff) === g2.getRaster.getSample(x, y, 0),
        s"gray ($x,$y)")
    val color = Jpeg.encodeJpegColor(32, 16,
      (x, y) => blockColor(3L)(x / 16, y / 16), subsample420 = false)
    val c1 = Jpeg.decodeJpeg(color).get
    val c2 = viaImageIo(color)
    for (y <- 0 until 16; x <- 0 until 32)
      assert((c1.rgb(y * 32 + x) & 0xffffff) === (c2.getRGB(x, y) & 0xffffff),
        s"color444 ($x,$y)")
    val c420 = Jpeg.encodeJpegColor(16, 16,
      (x, y) => blockColor(9L)(0, 0), subsample420 = true)
    val d1 = Jpeg.decodeJpeg(c420).get
    val d2 = viaImageIo(c420)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((d1.rgb(y * 16 + x) & 0xffffff) === (d2.getRGB(x, y) & 0xffffff),
        s"color420 ($x,$y)")
  }

  test("general-content grayscale round-trips within quantization tolerance") {
    val (w, h) = (32, 24)
    def px(x: Int, y: Int): Int = (128 + 60 * StrictMath.sin(x * 0.35) *
      StrictMath.cos(y * 0.23)).toInt
    val img = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, px)).get
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs((img.rgb(y * w + x) & 0xff) - px(x, y)))
    // all-ones quant: the only loss is coefficient rounding (≤ ½ per
    // coefficient); the reconstruction error stays within a few levels
    assert(maxErr <= 3, s"max abs error $maxErr")
  }

  test("restart markers: byte-aligned RSTn segments with DC predictor resets") {
    // Four DC-only 8×8 blocks, DRI = 1 → a restart marker after every
    // MCU and a predictor reset in each segment. Segments are harvested
    // from single-block encodes (each independently predicts from 0 —
    // exactly the post-restart contract).
    val vals = Seq(200, 90, 255, 0)
    def entropyOf(v: Int): Array[Byte] = {
      val whole = Jpeg.encodeJpegGray(8, 8, (_, _) => v)
      // scan data sits between the SOS segment (14 bytes: marker+len+6
      // payload... located by searching) and the trailing EOI
      val sos = (0 until whole.length - 1).find(i =>
        (whole(i) & 0xff) == 0xff && (whole(i + 1) & 0xff) == 0xda).get
      val len = ((whole(sos + 2) & 0xff) << 8) | (whole(sos + 3) & 0xff)
      whole.slice(sos + 2 + len, whole.length - 2)
    }
    val one = Jpeg.encodeJpegGray(8, 8, (_, _) => vals.head)
    val sos = (0 until one.length - 1).find(i =>
      (one(i) & 0xff) == 0xff && (one(i + 1) & 0xff) == 0xda).get
    val header = one.slice(0, sos) // SOI..DHTs, with an 8×8 SOF to patch
    // patch SOF dims to 16×16 (bytes follow the C0 marker: len(2), prec,
    // h(2), w(2) — find the SOF segment and rewrite)
    val sof = (0 until header.length - 1).find(i =>
      (header(i) & 0xff) == 0xff && (header(i + 1) & 0xff) == 0xc0).get
    header(sof + 5) = 0; header(sof + 6) = 16 // height
    header(sof + 7) = 0; header(sof + 8) = 16 // width
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val sosSeg = one.slice(sos, sos + 2 + (((one(sos + 2) & 0xff) << 8) | (one(sos + 3) & 0xff)))
    val body = vals.zipWithIndex.flatMap { case (v, i) =>
      val e = entropyOf(v)
      if (i < vals.length - 1)
        e ++ Array(0xff.toByte, (0xd0 + i).toByte)
      else e
    }.toArray
    val payload = header ++ dri ++ sosSeg ++ body ++
      Array(0xff, 0xd9).map(_.toByte)
    val img = Jpeg.decodeJpeg(payload).get
    assert(img.width === 16 && img.height === 16)
    // MCU order: (0,0) (1,0) (0,1) (1,1)
    val expect = Map((0, 0) -> vals(0), (1, 0) -> vals(1),
      (0, 1) -> vals(2), (1, 1) -> vals(3))
    for (y <- 0 until 16; x <- 0 until 16)
      assert((img.rgb(y * 16 + x) & 0xff) === expect((x / 8, y / 8)), s"($x,$y)")
  }

  test("malformed and unsupported payloads return None, never throw") {
    val good = Jpeg.encodeJpegColor(16, 16,
      (x, y) => blockColor(1L)(0, 0), subsample420 = true)
    assert(Jpeg.decodeJpeg(good).isDefined)
    assert(Jpeg.decodeJpeg(null) === None)
    assert(Jpeg.decodeJpeg(Array[Byte](1, 2)) === None)
    assert(Jpeg.decodeJpeg(good.take(40)) === None)          // truncated headers
    assert(Jpeg.decodeJpeg(good.take(good.length - 6)) === None) // truncated scan
    // progressive SOF2 is refused: rewrite the SOF0 marker byte
    val sof = (0 until good.length - 1).find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    assert(Jpeg.decodeJpeg(good.updated(sof + 1, 0xc2.toByte)) === None)
    // 12-bit precision refused (precision byte right after SOF length)
    assert(Jpeg.decodeJpeg(good.updated(sof + 4, 12.toByte)) === None)
    // truncated SEGMENTS: content shorter than the parser's required
    // read must return None, not throw or swallow the next marker
    def seg(marker: Int, content: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((content.length + 2) >> 8).toByte, ((content.length + 2) & 0xff).toByte) ++
        content
    val soi = Array(0xff.toByte, 0xd8.toByte)
    // DQT with len=3 as the last bytes: 1 byte of a 65-byte table
    assert(Jpeg.decodeJpeg(soi ++ seg(0xdb, Array(0x00.toByte))) === None)
    // DHT cut inside the 16 bit-counts
    assert(Jpeg.decodeJpeg(soi ++ seg(0xc4, Array(0x00.toByte, 1, 2))) === None)
    // DHT whose bit counts promise more values than the segment holds
    assert(Jpeg.decodeJpeg(soi ++ seg(0xc4,
      Array[Byte](0x00, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))) === None)
    // SOF0 with fewer component specs than nc declares
    assert(Jpeg.decodeJpeg(soi ++ seg(0xc0,
      Array[Byte](8, 0, 16, 0, 16, 3, 1, 0x22, 0))) === None)
    // SOF0 shorter than the fixed 6-byte header
    assert(Jpeg.decodeJpeg(soi ++ seg(0xc0, Array[Byte](8, 0, 16))) === None)
    // DRI with a 1-byte body
    assert(Jpeg.decodeJpeg(soi ++ seg(0xdd, Array[Byte](0))) === None)
    // zero-length segment (len < 2 is structurally invalid)
    assert(Jpeg.decodeJpeg(soi ++ Array(0xff.toByte, 0xdb.toByte,
      0.toByte, 0.toByte)) === None)
    // mid-file short DQT: the truncated table must NOT consume the
    // following SOF0's bytes as table data — decode refuses instead
    val dqtShort = seg(0xdb, Array(0x00.toByte) ++ Array.fill(32)(1.toByte))
    val sofOk = seg(0xc0, Array[Byte](8, 0, 16, 0, 16, 1, 1, 0x11, 0))
    assert(Jpeg.decodeJpeg(soi ++ dqtShort ++ sofOk) === None)
    // SOS with a truncated component-selector list
    val sosShort = seg(0xda, Array[Byte](1, 1))
    assert(Jpeg.decodeJpeg(soi ++ sofOk ++ sosShort) === None)
  }

  test("synthetic parity rows: every decoded pixel equals the closed form") {
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id")
    val rows = Jpeg.syntheticJpegStats(ids, "doc_id").collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("jpeg_eq_closed") === 1L, s"id ${r.getLong(0)}")
      assert(r.getAs[Long]("n_px") ===
        r.getAs[Long]("w") * r.getAs[Long]("h"))
    }
  }
}
