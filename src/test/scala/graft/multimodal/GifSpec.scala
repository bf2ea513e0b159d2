package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Gif]] — LZW + block walk + interlace. Validated by a hand-checked
  * tiny LZW stream, exact round-trips (incl. interlaced and a
  * dictionary-overflow stress that crosses the 4096 reset), a
  * cross-decode against the JDK's own ImageIO GIF reader, and the
  * closed-form parity rows.
  */
class GifSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decoder inverts a HAND-assembled LZW stream") {
    // 2×2 image, 2-color palette, indexes 0,1,1,0. minCodeSize = 2
    // (spec floor), so clear = 4, EOI = 5, initial width 3. The code
    // sequence is clear,0,1,1,0,EOI; the decoder's dictionary reaches
    // 8 entries after the THIRD data code (adds [0,1] then [1,1]), so
    // the width grows to 4 bits exactly there — the last two codes are
    // 4-bit. Hand-packed LSB-first:
    //   (4,w3)(0,w3)(1,w3)(1,w3)(0,w4)(5,w4)
    //   bit positions: 4→001@0-2, 0→@3-5, 1→100@6-8, 1→100@9-11,
    //                  0→@12-15, 5→1010@16-19
    //   bytes: 0b01000100=0x44, 0b00000010=0x02, 0b00000101=0x05
    // — this fixture also pins the width-growth TIMING, the classic
    // GIF-LZW off-by-one.
    val lzw = Array(0x44, 0x02, 0x05).map(_.toByte)
    val payload =
      "GIF89a".getBytes("US-ASCII") ++
        Array(2, 0, 2, 0).map(_.toByte) ++           // screen 2×2
        Array(0x80, 0, 0).map(_.toByte) ++           // GCT, 2 entries
        Array(10, 20, 30, 200, 210, 220).map(_.toByte) ++
        Array(0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0).map(_.toByte) ++ // descriptor
        Array(2).map(_.toByte) ++                    // min code size
        Array(3).map(_.toByte) ++ lzw ++             // one 3-byte sub-block
        Array(0, 0x3b).map(_.toByte)                 // terminator, trailer
    val img = Gif.decodeGif(payload).get
    assert(img.width === 2 && img.height === 2 && !img.interlaced)
    val c0 = (10 << 16) | (20 << 8) | 30
    val c1 = (200 << 16) | (210 << 8) | 220
    assert(img.rgb.toSeq === Seq(c0, c1, c1, c0))
  }

  test("round-trip inverts exactly, interlaced and not, and ImageIO agrees") {
    def viaImageIo(bytes: Array[Byte]) =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val palette = Array(0x102030, 0xff8040, 0x00ff00, 0x123456, 0xfedcba)
    def index(x: Int, y: Int): Int = (x * 3 + y * 7) % palette.length
    Seq(false, true).foreach { inter =>
      val bytes = Gif.encodeGif(23, 17, palette, index, interlaced = inter)
      val img = Gif.decodeGif(bytes).get
      assert(img.width === 23 && img.height === 17 && img.interlaced === inter)
      for (y <- 0 until 17; x <- 0 until 23)
        assert(img.rgb(y * 23 + x) === palette(index(x, y)), s"($x,$y) inter=$inter")
      val ref = viaImageIo(bytes)
      for (y <- 0 until 17; x <- 0 until 23)
        assert((ref.getRGB(x, y) & 0xffffff) === palette(index(x, y)),
          s"ImageIO ($x,$y) inter=$inter")
    }
  }

  test("LZW dictionary overflow: the 4096 reset round-trips") {
    // 128×128 with 16 colors of high-entropy content — thousands of
    // dictionary phrases, crossing the 4096 cap and the in-stream
    // clear/reset at least once
    val palette = (0 until 16).map(i => i * 0x111111).toArray
    def index(x: Int, y: Int): Int = {
      val h = x * 2654435761L + y * 40503L
      (((h >> 7) ^ h) & 15L).toInt
    }
    val bytes = Gif.encodeGif(128, 128, palette, index)
    val img = Gif.decodeGif(bytes).get
    for (y <- 0 until 128; x <- 0 until 128)
      assert(img.rgb(y * 128 + x) === palette(index(x, y)), s"($x,$y)")
    // and a real-world decoder agrees the stream is well-formed
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until 128 by 7; x <- 0 until 128 by 5)
      assert((ref.getRGB(x, y) & 0xffffff) === palette(index(x, y)),
        s"ImageIO ($x,$y)")
  }

  test("EOI lands on a width boundary: the decoder's final dictionary add is mirrored") {
    // 64 identical pixels at minCodeSize 2: the decoder's add AFTER the
    // final data code pushes next to 16 = 2^4, growing the read width
    // to 5 exactly at EOI — an encoder that writes EOI at the old width
    // truncates it (the bug this pins). Cross-check with ImageIO too.
    val one = Gif.encodeGif(8, 8, Array(0x326496), (_, _) => 0)
    val img = Gif.decodeGif(one).get
    assert(img.rgb.forall(_ == 0x326496) && img.rgb.length === 64)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one))
    assert((ref.getRGB(7, 7) & 0xffffff) === 0x326496)
  }

  test("extensions are skipped; malformed payloads return None, never throw") {
    val good = Gif.encodeGif(8, 8, Array(0x112233, 0x445566), (x, y) => (x + y) % 2)
    assert(Gif.decodeGif(good).isDefined)
    // splice a Graphic Control Extension before the image descriptor
    val imgDesc = good.indexWhere(_ == 0x2c.toByte)
    val gce = Array(0x21, 0xf9, 4, 0, 0, 0, 0, 0).map(_.toByte)
    val spliced = good.take(imgDesc) ++ gce ++ good.drop(imgDesc)
    assert(Gif.decodeGif(spliced).isDefined)
    assert(Gif.decodeGif(null) === None)
    assert(Gif.decodeGif("GIF89a".getBytes("US-ASCII")) === None)
    assert(Gif.decodeGif(good.take(good.length - 6)) === None) // truncated
    assert(Gif.decodeGif(good.updated(0, 'X'.toByte)) === None)
    // corrupt LZW byte → dictionary desync or bad index → None, no throw
    val corrupted = good.updated(imgDesc + 12, (good(imgDesc + 12) ^ 0x7f).toByte)
    assert(Gif.decodeGif(corrupted).isEmpty ||
      Gif.decodeGif(corrupted).get.rgb.length === 64)
  }

  test("synthetic parity rows: every decoded pixel equals the closed form") {
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id")
    val rows = Gif.syntheticGifStats(ids, "doc_id").collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(r.getAs[Long]("gif_eq_closed") === 1L, s"id ${r.getLong(0)}")
    }
    // GIF is lossless, so its decoded aHash must equal the BMP/PNG
    // family's ONLY where the pixel functions align — here the fixture
    // family is the JPEG one; instead pin the stats against the JPEG
    // rows' SOURCE (pre-YCbCr) colors via the closed form implicitly
    // (gif_eq_closed above) and check interlace coverage:
    assert(rows.count(_.getAs[Long]("interlaced") == 1L) === 50)
  }
}
