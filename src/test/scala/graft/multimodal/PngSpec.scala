package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Png]] — the zero-dependency PNG codec: the decoder must invert
  * hand-computed filter arithmetic (not just the encoder — a shared bug
  * would cancel out), round-trip every scanline filter on both color
  * types, agree with the BMP codec on the same pixels, and refuse
  * malformed or unsupported payloads without throwing.
  */
class PngSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val c = new java.util.zip.CRC32
    c.update(t); c.update(data)
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    be32(data.length.toLong) ++ t ++ data ++ be32(c.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(raw); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    } finally d.end()
  }

  private val signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def ihdr(w: Int, h: Int, colorType: Int, bitDepth: Int = 8,
      interlace: Int = 0): Array[Byte] =
    Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      bitDepth.toByte, colorType.toByte, 0, 0, interlace.toByte)

  test("decoder inverts HAND-COMPUTED filtered scanlines (all five filters)") {
    // 2×5 RGB image; rows carry filters 0..4. The filtered bytes below
    // are worked out BY HAND from the PNG spec's filter definitions —
    // if the decoder's unfiltering (incl. the Paeth tie-breaks and the
    // mod-256 wraps on rows 4's negative deltas) is wrong in any way,
    // these literals catch it independently of the encoder.
    val raw = Array(
      Array(10, 20, 30, 40, 50, 60),      // y0
      Array(15, 25, 35, 45, 55, 65),      // y1
      Array(100, 110, 120, 130, 140, 150), // y2
      Array(200, 210, 220, 230, 240, 250), // y3
      Array(5, 6, 7, 8, 9, 10))            // y4
    val filtered = Array(
      0, 10, 20, 30, 40, 50, 60,          // None
      1, 15, 25, 35, 30, 30, 30,          // Sub
      2, 85, 85, 85, 85, 85, 85,          // Up
      3, 150, 155, 160, 65, 65, 65,       // Average
      4, 61, 52, 43, 3, 3, 3              // Paeth (61 = (5-200) mod 256)
    ).map(_.toByte)
    val payload = signature ++ chunk("IHDR", ihdr(2, 5, 2)) ++
      chunk("IDAT", deflate(filtered)) ++ chunk("IEND", Array.empty[Byte])
    val img = Png.decodePng(payload).get
    assert(img.width === 2 && img.height === 5 && !img.hasAlpha)
    raw.zipWithIndex.foreach { case (row, y) =>
      (0 until 2).foreach { x =>
        val p = img.argb(y * 2 + x)
        assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) ===
          (row(3 * x), row(3 * x + 1), row(3 * x + 2)), s"pixel ($x,$y)")
        assert((p >>> 24) === 255)
      }
    }
  }

  test("round-trip inverts exactly: every filter type, both color types") {
    Seq(2, 6).foreach { ct =>
      val (w, h) = (7, 11) // h > 5 → every row filter (y % 5) appears
      def px(x: Int, y: Int) =
        ((x * 37 + y * 101) % 256, (x * 53 + y * 7) % 256,
          (x * 11 + y * 191) % 256, (x * 71 + y * 13) % 256)
      val img = Png.decodePng(
        Png.encodePng(w, h, ct, px, y => y % 5)).get
      assert(img.width === w && img.height === h && img.hasAlpha === (ct == 6))
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b, a) = px(x, y)
        val p = img.argb(y * w + x)
        assert(((p >> 16) & 0xff) === r)
        assert(((p >> 8) & 0xff) === g)
        assert((p & 0xff) === b)
        assert((p >>> 24) === (if (ct == 6) a else 255), s"alpha ($x,$y) ct=$ct")
      }
    }
  }

  test("ancillary chunks are skipped, not fatal") {
    val base = Png.encodePng(4, 3, 2, (x, y) => (x, y, x + y, 255))
    // splice a tEXt chunk between IHDR (8+12+13 bytes in) and IDAT
    val cut = signature.length + 12 + 13
    val spliced = base.take(cut) ++
      chunk("tEXt", "k\u0000v".getBytes("US-ASCII")) ++ base.drop(cut)
    val img = Png.decodePng(spliced).get
    assert(img.width === 4 && img.height === 3)
    assert(img.argb(1 * 4 + 2) === (255 << 24 | 2 << 16 | 1 << 8 | 3))
  }

  test("malformed and unsupported payloads return None, never throw") {
    val good = Png.encodePng(5, 4, 6, (x, y) => (x, y, x * y, x + y), _ % 5)
    assert(Png.decodePng(good).isDefined)
    assert(Png.decodePng(null) === None)
    assert(Png.decodePng(Array[Byte](1, 2, 3)) === None)
    // wrong signature
    assert(Png.decodePng(good.updated(0, 0x42.toByte)) === None)
    // corrupted IDAT byte → CRC mismatch
    val idatPos = good.length - 12 - 20 // somewhere inside IDAT data
    assert(Png.decodePng(
      good.updated(idatPos, (good(idatPos) ^ 0x5a).toByte)) === None)
    // truncated mid-IDAT
    assert(Png.decodePng(good.take(good.length - 20)) === None)
    // unsupported / malformed variant payloads
    def withIhdr(d: Array[Byte]): Array[Byte] =
      signature ++ chunk("IHDR", d) ++
        chunk("IDAT", deflate(new Array[Byte](8))) ++
        chunk("IEND", Array.empty[Byte])
    // palette type with NO PLTE chunk
    assert(Png.decodePng(withIhdr(ihdr(2, 2, colorType = 3))) === None)
    // sub-byte palette depth (the documented remaining waiver)
    assert(Png.decodePng(withIhdr(ihdr(2, 2, 3, bitDepth = 4))) === None)
    // 16-bit palette is illegal per spec
    assert(Png.decodePng(withIhdr(ihdr(2, 2, 3, bitDepth = 16))) === None)
    // declared size larger than the deflated data actually holds —
    // for plain, 16-bit and interlaced geometry alike
    def short(d: Array[Byte]): Array[Byte] =
      signature ++ chunk("IHDR", d) ++
        chunk("IDAT", deflate(new Array[Byte](10))) ++
        chunk("IEND", Array.empty[Byte])
    assert(Png.decodePng(short(ihdr(16, 16, 2))) === None)
    assert(Png.decodePng(short(ihdr(16, 16, 2, bitDepth = 16))) === None)
    assert(Png.decodePng(short(ihdr(16, 16, 2, interlace = 1))) === None)
    // palette index past the PLTE table
    val palRaw = Array[Byte](0, 0, 5) // filter 0, indexes 0 and 5
    val oob = signature ++ chunk("IHDR", ihdr(2, 1, 3)) ++
      chunk("PLTE", Array[Byte](1, 2, 3, 4, 5, 6)) ++ // 2 entries
      chunk("IDAT", deflate(palRaw)) ++ chunk("IEND", Array.empty[Byte])
    assert(Png.decodePng(oob) === None)
    // empty / misaligned / oversized PLTE
    def withPlte(p: Array[Byte]): Array[Byte] =
      signature ++ chunk("IHDR", ihdr(1, 1, 3)) ++ chunk("PLTE", p) ++
        chunk("IDAT", deflate(Array[Byte](0, 0))) ++
        chunk("IEND", Array.empty[Byte])
    assert(Png.decodePng(withPlte(Array.empty[Byte])) === None)
    assert(Png.decodePng(withPlte(Array[Byte](1, 2))) === None)
    assert(Png.decodePng(withPlte(new Array[Byte](771))) === None)
  }

  test("palette PNG decodes through PLTE; tRNS supplies per-entry alpha") {
    // 5 distinct block colors over a 6×4 image, every filter exercised
    val colors = Array(0x102030, 0xff0000, 0x00ff00, 0x0000ff, 0x7f7f7f)
    def px(x: Int, y: Int) = {
      val c = colors((x / 2 + y) % 5)
      ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff, 255)
    }
    val pay = Png.encodePngExt(6, 4, 3, 8, interlaced = false, px, y => y % 5)
    val img = Png.decodePng(pay).get
    assert(img.width === 6 && img.height === 4 && !img.hasAlpha)
    for (y <- 0 until 4; x <- 0 until 6) {
      val (r, g, b, _) = px(x, y)
      val p = img.argb(y * 6 + x)
      assert((p >>> 24) === 255)
      assert(((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) === ((r, g, b)),
        s"pixel ($x,$y)")
    }
    // palette pixels must agree with the truecolor container byte-for-byte
    val viaRgb = Png.decodePng(Png.encodePng(6, 4, 2, px, y => y % 5)).get
    assert(img.argb.toSeq === viaRgb.argb.toSeq)
    // tRNS: splice per-entry alpha after PLTE (shorter than the palette
    // — uncovered entries default to 255)
    val plteEnd = {
      // signature + IHDR chunk (4 len + 4 type + 13 data + 4 crc) + PLTE
      val ihdrLen = 4 + 4 + 13 + 4
      signature.length + ihdrLen + (8 + colors.length * 3 + 4)
    }
    val trns = chunk("tRNS", Array[Byte](10.toByte, 200.toByte))
    val withTrns = pay.take(plteEnd) ++ trns ++ pay.drop(plteEnd)
    val ta = Png.decodePng(withTrns).get
    assert(ta.hasAlpha)
    for (y <- 0 until 4; x <- 0 until 6) {
      val idx = (x / 2 + y) % 5
      val expA = idx match { case 0 => 10; case 1 => 200; case _ => 255 }
      assert((ta.argb(y * 6 + x) >>> 24) === expA, s"alpha ($x,$y)")
      assert((ta.argb(y * 6 + x) & 0xffffff) === (img.argb(y * 6 + x) & 0xffffff))
    }
  }

  test("16-bit samples reduce to their high byte (low bytes discarded, both color types)") {
    def px(x: Int, y: Int) =
      ((x * 37 + y * 101) % 256, (x * 53 + y * 7) % 256,
        (x * 11 + y * 191) % 256, (x * 71 + y * 13) % 256)
    Seq(2, 6).foreach { ct =>
      val img = Png.decodePng(
        Png.encodePngExt(7, 11, ct, 16, interlaced = false, px, y => y % 5)).get
      assert(img.width === 7 && img.height === 11)
      for (y <- 0 until 11; x <- 0 until 7) {
        val (r, g, b, a) = px(x, y)
        val p = img.argb(y * 7 + x)
        assert(((p >> 16) & 0xff) === r, s"r ($x,$y) ct=$ct")
        assert(((p >> 8) & 0xff) === g)
        assert((p & 0xff) === b)
        assert((p >>> 24) === (if (ct == 6) a else 255))
      }
    }
  }

  test("grayscale (type 0) replicates the gray sample into all channels") {
    def px(x: Int, y: Int) = {
      val v = (x * 29 + y * 67) % 256
      (v, v, v, 255)
    }
    Seq(8, 16).foreach { depth =>
      val img = Png.decodePng(
        Png.encodePngExt(5, 7, 0, depth, interlaced = false, px, y => y % 5)).get
      for (y <- 0 until 7; x <- 0 until 5) {
        val v = (x * 29 + y * 67) % 256
        assert(img.argb(y * 5 + x) === ((255 << 24) | (v << 16) | (v << 8) | v),
          s"pixel ($x,$y) depth=$depth")
      }
    }
  }

  test("sub-byte depths: gray 1/2/4 scale over the depth range; palette 1/2/4 index bit-packed rows") {
    // gray: ragged widths force row-end padding bits (w=9 at depth 1 →
    // 2 bytes with 7 pad bits; w=5 at depth 4 → 3 bytes with 4)
    for (depth <- Seq(1, 2, 4); (w, h) <- Seq((9, 5), (5, 4), (8, 3), (1, 1))) {
      val mx = (1 << depth) - 1
      def gv(x: Int, y: Int) = (x * 3 + y * 5) % (mx + 1)
      val img = Png.decodePng(Png.encodePngExt(w, h, 0, depth,
        interlaced = false, (x, y) => (gv(x, y), 0, 0, 255), y => y % 5)).get
      for (y <- 0 until h; x <- 0 until w) {
        val g8 = gv(x, y) * 255 / mx
        assert(img.argb(y * w + x) ===
          ((255 << 24) | (g8 << 16) | (g8 << 8) | g8),
          s"gray ($x,$y) depth=$depth ${w}x$h")
      }
    }
    // palette at depths 1/2/4: ≤ 2^d colors, bit-packed indexes
    for (depth <- Seq(1, 2, 4)) {
      val n = 1 << depth
      val colors = Array.tabulate(n)(i => (i * 37 % 256) << 16 | (i * 91 % 256) << 8 | (i * 53 % 256))
      def px(x: Int, y: Int) = {
        val c = colors((x + 2 * y) % n)
        ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff, 255)
      }
      val img = Png.decodePng(Png.encodePngExt(7, 5, 3, depth,
        interlaced = false, px, y => y % 5)).get
      for (y <- 0 until 5; x <- 0 until 7) {
        val (r, g, b, _) = px(x, y)
        assert((img.argb(y * 7 + x) & 0xffffff) === ((r << 16) | (g << 8) | b),
          s"palette ($x,$y) depth=$depth")
      }
    }
    // sub-byte + Adam7 composes (pass rows have their own padding)
    def gv4(x: Int, y: Int) = (x + y) % 16
    val plain = Png.decodePng(Png.encodePngExt(13, 9, 0, 4,
      interlaced = false, (x, y) => (gv4(x, y), 0, 0, 255), y => y % 5)).get
    val inter = Png.decodePng(Png.encodePngExt(13, 9, 0, 4,
      interlaced = true, (x, y) => (gv4(x, y), 0, 0, 255), y => y % 5)).get
    assert(inter.argb.toSeq === plain.argb.toSeq)
  }

  test("gray+alpha (type 4) carries per-pixel alpha at depths 8 and 16") {
    def px(x: Int, y: Int) = {
      val v = (x * 29 + y * 67) % 256
      (v, v, v, (x * 71 + y * 13) % 256)
    }
    Seq(8, 16).foreach { depth =>
      val img = Png.decodePng(Png.encodePngExt(7, 11, 4, depth,
        interlaced = false, px, y => y % 5)).get
      assert(img.hasAlpha)
      for (y <- 0 until 11; x <- 0 until 7) {
        val (v, _, _, a) = px(x, y)
        assert(img.argb(y * 7 + x) ===
          ((a << 24) | (v << 16) | (v << 8) | v),
          s"($x,$y) depth=$depth")
      }
    }
  }

  test("Adam7 interlaced decode equals the non-interlaced decode of the same pixels") {
    def px(x: Int, y: Int) =
      ((x * 37 + y * 101) % 256, (x * 53 + y * 7) % 256,
        (x * 11 + y * 191) % 256, (x * 71 + y * 13) % 256)
    // dims straddle the 8×8 pass grid: sub-8, exactly 8, and ragged
    for ((w, h) <- Seq((3, 2), (8, 8), (13, 9), (1, 1), (16, 5));
         ct <- Seq(2, 6)) {
      val plain = Png.decodePng(
        Png.encodePngExt(w, h, ct, 8, interlaced = false, px, y => y % 5)).get
      val inter = Png.decodePng(
        Png.encodePngExt(w, h, ct, 8, interlaced = true, px, y => y % 5)).get
      assert(inter.width === w && inter.height === h)
      assert(inter.argb.toSeq === plain.argb.toSeq, s"${w}x$h ct=$ct")
    }
    // 16-bit interlaced composes too
    val p16 = Png.decodePng(
      Png.encodePngExt(13, 9, 2, 16, interlaced = true, px, y => y % 5)).get
    val p8 = Png.decodePng(
      Png.encodePngExt(13, 9, 2, 8, interlaced = false, px, y => y % 5)).get
    assert(p16.argb.toSeq === p8.argb.toSeq)
    // interlaced palette
    def ppx(x: Int, y: Int) = {
      val c = Array(0x102030, 0xff0000, 0x00ff00)((x + y) % 3)
      ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff, 255)
    }
    val pi = Png.decodePng(
      Png.encodePngExt(9, 6, 3, 8, interlaced = true, ppx, y => y % 5)).get
    val pp = Png.decodePng(
      Png.encodePngExt(9, 6, 3, 8, interlaced = false, ppx, y => y % 5)).get
    assert(pi.argb.toSeq === pp.argb.toSeq)
  }

  test("every variant container cross-decodes pixel-exact against the JDK's ImageIO") {
    // the JpegSpec pattern: an INDEPENDENT reference decoder must agree
    // with ours on the same bytes — encoder/decoder bug pairs can't
    // cancel out. Covers truecolor/RGBA/palette/gray × 8/16-bit ×
    // both interlace methods on ragged dims.
    def px(x: Int, y: Int) =
      ((x * 37 + y * 101) % 256, (x * 53 + y * 7) % 256,
        (x * 11 + y * 191) % 256, 255)
    def gpx(x: Int, y: Int) = {
      val v = (x * 29 + y * 67) % 256; (v, v, v, 255)
    }
    def ppx(x: Int, y: Int) = {
      val c = Array(0x102030, 0xff0000, 0x00ff00, 0x0000ff)((x + y) % 4)
      ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff, 255)
    }
    def g4px(x: Int, y: Int) = { val v = (x + 2 * y) % 16; (v, v, v, 255) }
    val cases = Seq(
      (2, 8, false, px _), (2, 8, true, px _), (6, 8, true, px _),
      (2, 16, false, px _), (2, 16, true, px _),
      (0, 8, false, gpx _), (0, 16, true, gpx _),
      (0, 4, false, g4px _), (0, 4, true, g4px _),
      (3, 8, false, ppx _), (3, 8, true, ppx _),
      (3, 2, false, ppx _), (3, 2, true, ppx _))
    cases.foreach { case (ct, depth, inter, f) =>
      val pay = Png.encodePngExt(13, 9, ct, depth, inter, f, y => y % 5)
      val ours = Png.decodePng(pay).get
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pay))
      assert(jdk != null, s"ImageIO refused ct=$ct depth=$depth inter=$inter")
      assert(jdk.getWidth === 13 && jdk.getHeight === 9)
      for (y <- 0 until 9; x <- 0 until 13) {
        val p = ours.argb(y * 13 + x)
        if (ct == 0) {
          // grayscale: getRGB re-encodes through sRGB (a gamma curve),
          // so compare the RAW raster sample — 16-bit keeps all 16
          // bits there (high byte = our MSB reduction); sub-byte
          // samples stay in the depth domain and scale like ours
          val raw = jdk.getRaster.getSample(x, y, 0)
          val theirs =
            if (depth == 16) raw >> 8
            else if (depth < 8) raw * 255 / ((1 << depth) - 1)
            else raw
          assert((p & 0xff) === theirs, s"($x,$y) gray depth=$depth inter=$inter")
        } else if (depth == 8) {
          assert(p === jdk.getRGB(x, y), s"($x,$y) ct=$ct inter=$inter")
        } else {
          // 16-bit color: getRGB downsamples v16*255/65535 rounded,
          // which can differ from the plain MSB by 1 when the low
          // byte is large — compare channels with ±1 tolerance
          val theirs = jdk.getRGB(x, y)
          Seq(16, 8, 0).foreach { sh =>
            val a = (p >> sh) & 0xff; val b = (theirs >> sh) & 0xff
            assert(math.abs(a - b) <= 1,
              s"($x,$y) ct=$ct depth=16 inter=$inter shift=$sh: $a vs $b")
          }
        }
      }
    }
  }

  test("PNG parity rows: decoded RGB ≡ the BMP twin, aHash identical across codecs") {
    val ids = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select("doc_id")
    val png = Png.syntheticPngParity(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(png.size === 100)
    png.values.foreach { r =>
      assert(r.getAs[Long]("png_eq_bmp") === 1L, s"id ${r.getLong(0)}")
    }
    // alpha never feeds luma, so the PNG-decoded aHash must equal the
    // BMP-decoded one for every id — cross-codec fingerprint stability
    val bmp = Multimodal.syntheticBmpAHash(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ahash")).toMap
    png.foreach { case (id, r) =>
      assert(r.getAs[Long]("ahash") === bmp(id), s"id $id")
    }
  }
}
