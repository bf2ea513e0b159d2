package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** REAL, zero-dependency baseline JPEG codec — the last image slice of
  * the compressed-codec waiver: baseline sequential DCT (SOF0), 8-bit,
  * grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling, standard
  * JPEG-spec (Annex K) Huffman tables, restart markers, and byte
  * stuffing — decoded with nothing beyond the JDK. Progressive (SOF2),
  * arithmetic coding, and 12-bit precision return None (documented
  * remainder; Opus stays the one compressed-audio waiver).
  *
  * Determinism contract (what lets a SQL oracle pin decoded pixels):
  *  - color conversion is FIXED-POINT with published integer constants
  *    and a bias trick so every shift operates on a non-negative value
  *    (identical semantics in Scala and SQL floor-division);
  *  - the DCT is the exact orthonormal transform in IEEE doubles
  *    (StrictMath cosine table — platform-independent), so a CONSTANT
  *    8×8 block has DC = 8·(v−128) exactly and every AC rounds to 0:
  *    with an all-ones quant table, block-constant images round-trip
  *    BIT-EXACTLY through the entire entropy-coding + DCT pipeline,
  *    and an oracle computes decode(encode(px)) closed-form as just
  *    the integer YCbCr round-trip.
  *
  * Reference anchor: the reference never decodes media (SURVEY §2.7);
  * this is the mapPartitions-boundary codec an image-curation pipeline
  * runs at 100 TB — pixels never shuffle, only derived stats do.
  */
object Jpeg extends Serializable {

  /** Decoded pixels, row-major from the top-left, packed
    * `(r << 16) | (g << 8) | b` (grayscale replicated into all three).
    */
  final case class JpegPixels(width: Int, height: Int, gray: Boolean,
      rgb: Array[Int])

  // ----------------------------------------------------------------
  // Tables: zig-zag order + the JPEG-spec Annex K Huffman tables
  // ----------------------------------------------------------------

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // (bits[1..16], values) per table — the public Annex K constants
  private val dcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumVals = (0 to 11).toArray
  private val dcChrBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChrVals = (0 to 11).toArray
  private val acLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val acChrBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman ENCODE table: value → (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    (1 to 16).foreach { len =>
      (0 until bits(len)).foreach { _ =>
        out(vals(k)) = (code, len); code += 1; k += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Canonical Huffman DECODE table (F.2.2.3's mincode/maxcode/valptr). */
  private final class HuffDecode(bits: Array[Int], val vals: Array[Int]) {
    val minCode: Array[Int] = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1)
    val valPtr: Array[Int] = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      (1 to 16).foreach { len =>
        if (bits(len) > 0) {
          valPtr(len) = k; minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  // ----------------------------------------------------------------
  // Exact orthonormal DCT (StrictMath cosine table — IEEE-portable)
  // ----------------------------------------------------------------

  private val cosT: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
    t
  }
  private val invSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  /** Forward DCT of a level-shifted block (row-major, values −128..127):
    * F(u,v) = ¼·C(u)·C(v)·ΣΣ p·cos·cos. A constant block v yields
    * DC = 8·v exactly and AC ≈ 0 (rounds to 0).
    */
  private def fdct(p: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += p(y * 8 + x) * cosT(x * 8 + u) * cosT(y * 8 + v)
            x += 1
          }
          y += 1
        }
        val cu = if (u == 0) invSqrt2 else 1.0
        val cv = if (v == 0) invSqrt2 else 1.0
        out(v * 8 + u) = 0.25 * cu * cv * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse DCT of dequantized coefficients → clamped 0..255 samples.
    * A DC-only block decodes to the constant clamp(round(DC/8) + 128).
    */
  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) invSqrt2 else 1.0
              val cv = if (v == 0) invSqrt2 else 1.0
              s += cu * cv * c * cosT(x * 8 + u) * cosT(y * 8 + v)
            }
            u += 1
          }
          v += 1
        }
        val p = StrictMath.round(0.25 * s).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  // ----------------------------------------------------------------
  // Fixed-point YCbCr (bias trick: every shift sees a non-negative
  // value, so Scala >> and SQL floor-division agree symbol-for-symbol)
  // ----------------------------------------------------------------

  private val Bias = 256 << 16

  /** RGB → (y, cb, cr), each 0..255. Constants sum to 65536 (y) / 0. */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = (((-11056 * r - 21712 * g + 32768 * b + 32768 + Bias) >> 16) - 256) + 128
    val cr = (((32768 * r - 27440 * g - 5328 * b + 32768 + Bias) >> 16) - 256) + 128
    (y, cb, cr)
  }

  /** (y, cb, cr) → clamped RGB — the decoder's exact integer chain
    * (and the oracle's: same constants, same bias, same floor-shift).
    */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = y + (((91881 * (cr - 128) + 32768 + Bias) >> 16) - 256)
    val g = y - (((22554 * (cb - 128) + 46802 * (cr - 128) + 32768 + Bias) >> 16) - 256)
    val b = y + (((116130 * (cb - 128) + 32768 + Bias) >> 16) - 256)
    (cl(r), cl(g), cl(b))
  }

  // ----------------------------------------------------------------
  // Bit I/O with 0xFF byte stuffing
  // ----------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { put(0x7f, 8 - nbits) } // 1-pad
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    var hitMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos < data.length && (data(pos) & 0xff) == 0x00) pos += 1
          else { pos -= 1; hitMarker = true; return 0 } // real marker
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Boolean = {
      nbits = 0; hitMarker = false
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == (0xd0 + expected)) { pos += 2; true }
      else false
    }
  }

  // ----------------------------------------------------------------
  // Encoder
  // ----------------------------------------------------------------

  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def emitCoef(bw: BitWriter, v: Int, s: Int): Unit =
    if (s > 0) bw.put(if (v >= 0) v else v + (1 << s) - 1, s)

  /** Quantize the FDCT of one level-shifted block and entropy-code it.
    * Returns the new DC predictor.
    */
  private def encodeBlock(bw: BitWriter, samples: Array[Int], quant: Array[Int],
      dcTab: Map[Int, (Int, Int)], acTab: Map[Int, (Int, Int)],
      pred: Int): Int = {
    val shifted = new Array[Double](64)
    var i = 0
    while (i < 64) { shifted(i) = samples(i) - 128.0; i += 1 }
    val f = fdct(shifted)
    val q = new Array[Int](64)
    i = 0
    while (i < 64) {
      val v = StrictMath.round(f(zigzag(i)) / quant(i)).toInt
      // baseline AC symbols carry at most 10 magnitude bits — saturate
      // (extra lossiness only on adversarial high-frequency blocks; a
      // spec-legal quant table never produces a coefficient this big)
      q(i) = if (i == 0) v else math.max(-1023, math.min(1023, v))
      i += 1
    }
    val diff = q(0) - pred
    val s = category(diff)
    val (c, l) = dcTab(s); bw.put(c, l); emitCoef(bw, diff, s)
    var run = 0
    i = 1
    while (i < 64) {
      if (q(i) == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = acTab(0xf0); bw.put(zc, zl); run -= 16 }
        val sz = category(q(i))
        val (ac, al) = acTab((run << 4) | sz)
        bw.put(ac, al); emitCoef(bw, q(i), sz)
        run = 0
      }
      i += 1
    }
    if (run > 0) { val (ec, el) = acTab(0x00); bw.put(ec, el) }
    q(0)
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte, (len >> 8).toByte, len.toByte) ++ payload
  }

  /** JFIF APP0 (version 1.1, unitless 1:1 density, no thumbnail). */
  private def app0Seg: Array[Byte] =
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))

  private def dqtSeg(id: Int, quant: Array[Int]): Array[Byte] =
    seg(0xdb, (id.toByte +: quant.map(_.toByte)).toArray)

  private def dhtSeg(clazz: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
    seg(0xc4, (((clazz << 4) | id).toByte +:
      ((1 to 16).map(l => bits(l).toByte) ++ vals.map(_.toByte))).toArray)

  /** Baseline grayscale JPEG. `w`, `h` multiples of 8. */
  def encodeJpegGray(w: Int, h: Int, px: (Int, Int) => Int,
      quant: Array[Int] = Array.fill(64)(1)): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"dims ${w}x$h must be multiples of 8")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(app0Seg)
    out.write(dqtSeg(0, quant))
    out.write(seg(0xc0, Array[Byte](8, (h >> 8).toByte, h.toByte,
      (w >> 8).toByte, w.toByte, 1, 1, 0x11, 0))) // SOF0, 1 comp, 1x1, q0
    out.write(dhtSeg(0, 0, dcLumBits, dcLumVals))
    out.write(dhtSeg(1, 0, acLumBits, acLumVals))
    out.write(seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))) // SOS
    val scan = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(scan)
    val dcT = buildEncodeTable(dcLumBits, dcLumVals)
    val acT = buildEncodeTable(acLumBits, acLumVals)
    var pred = 0
    val block = new Array[Int](64)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      for (y <- 0 until 8; x <- 0 until 8)
        block(y * 8 + x) = px(bx * 8 + x, by * 8 + y) & 0xff
      pred = encodeBlock(bw, block, quant, dcT, acT, pred)
    }
    bw.flush()
    out.write(scan.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Baseline color JPEG (YCbCr): 4:4:4, or 4:2:0 when `subsample420`
    * (then `w`, `h` must be multiples of 16; chroma is the exact
    * (a+b+c+d+2)>>2 mean of each 2×2). `px(x, y)` returns (r, g, b).
    */
  def encodeJpegColor(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int),
      subsample420: Boolean,
      qY: Array[Int] = Array.fill(64)(1),
      qC: Array[Int] = Array.fill(64)(1)): Array[Byte] = {
    val mcu = if (subsample420) 16 else 8
    require(w % mcu == 0 && h % mcu == 0,
      s"dims ${w}x$h must be multiples of $mcu")
    val yP = new Array[Int](w * h); val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val (yy, cb, cr) = rgbToYcc(r & 0xff, g & 0xff, b & 0xff)
      yP(y * w + x) = yy; cbP(y * w + x) = cb; crP(y * w + x) = cr
    }
    val (cw, ch) = if (subsample420) (w / 2, h / 2) else (w, h)
    def down(p: Array[Int]): Array[Int] =
      if (!subsample420) p
      else {
        val d = new Array[Int](cw * ch)
        for (y <- 0 until ch; x <- 0 until cw)
          d(y * cw + x) = (p(2 * y * w + 2 * x) + p(2 * y * w + 2 * x + 1) +
            p((2 * y + 1) * w + 2 * x) + p((2 * y + 1) * w + 2 * x + 1) + 2) >> 2
        d
      }
    val cbD = down(cbP); val crD = down(crP)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte))
    out.write(app0Seg)
    out.write(dqtSeg(0, qY)); out.write(dqtSeg(1, qC))
    val samp = if (subsample420) 0x22 else 0x11
    out.write(seg(0xc0, Array[Byte](8, (h >> 8).toByte, h.toByte,
      (w >> 8).toByte, w.toByte, 3,
      1, samp.toByte, 0, 2, 0x11, 1, 3, 0x11, 1)))
    out.write(dhtSeg(0, 0, dcLumBits, dcLumVals))
    out.write(dhtSeg(1, 0, acLumBits, acLumVals))
    out.write(dhtSeg(0, 1, dcChrBits, dcChrVals))
    out.write(dhtSeg(1, 1, acChrBits, acChrVals))
    out.write(seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)))
    val scan = new java.io.ByteArrayOutputStream()
    val bw = new BitWriter(scan)
    val dcY = buildEncodeTable(dcLumBits, dcLumVals)
    val acY = buildEncodeTable(acLumBits, acLumVals)
    val dcC = buildEncodeTable(dcChrBits, dcChrVals)
    val acC = buildEncodeTable(acChrBits, acChrVals)
    var (pY, pCb, pCr) = (0, 0, 0)
    val block = new Array[Int](64)
    def grab(p: Array[Int], pw: Int, bx: Int, by: Int): Unit =
      for (y <- 0 until 8; x <- 0 until 8)
        block(y * 8 + x) = p((by * 8 + y) * pw + bx * 8 + x)
    val yBlocksPerMcu = if (subsample420) 2 else 1
    for (my <- 0 until h / mcu; mx <- 0 until w / mcu) {
      for (vy <- 0 until yBlocksPerMcu; vx <- 0 until yBlocksPerMcu) {
        grab(yP, w, mx * yBlocksPerMcu + vx, my * yBlocksPerMcu + vy)
        pY = encodeBlock(bw, block, qY, dcY, acY, pY)
      }
      grab(cbD, cw, mx, my); pCb = encodeBlock(bw, block, qC, dcC, acC, pCb)
      grab(crD, cw, mx, my); pCr = encodeBlock(bw, block, qC, dcC, acC, pCr)
    }
    bw.flush()
    out.write(scan.toByteArray)
    out.write(Array(0xff, 0xd9).map(_.toByte))
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decoder
  // ----------------------------------------------------------------

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def decodeHuff(br: BitReader, t: HuffDecode): Int = {
    var code = br.bit(); var len = 1
    while (len <= 16) {
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
        return t.vals(t.valPtr(len) + code - t.minCode(len))
      code = (code << 1) | br.bit(); len += 1
    }
    -1
  }

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  /** Decode a baseline JPEG. Returns None (never throws) on anything
    * outside the supported profile: progressive/arithmetic/12-bit,
    * >2 sampling factors, missing tables, truncation, or a corrupt
    * entropy stream.
    */
  def decodeJpeg(payload: Array[Byte]): Option[JpegPixels] = {
    if (payload == null || payload.length < 4) return None
    def u8(i: Int) = payload(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u8(0) != 0xff || u8(1) != 0xd8) return None
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int])
    val dcTabs = Array.fill(4)(null: HuffDecode)
    val acTabs = Array.fill(4)(null: HuffDecode)
    var comps: Array[Component] = null
    var w = 0; var h = 0; var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > payload.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > payload.length) return None
        val d = pos + 4
        // every parser below is bounded by the segment's own end — a
        // short/truncated segment returns None instead of reading the
        // next marker's bytes as table data (or running off the array)
        val segEnd = pos + 2 + len
        marker match {
          case 0xc0 => // SOF0 baseline
            if (d + 6 > segEnd) return None
            if (u8(d) != 8) return None
            h = u16(d + 1); w = u16(d + 3)
            val nc = u8(d + 5)
            if (w < 1 || h < 1 || (nc != 1 && nc != 3)) return None
            if (d + 6 + 3 * nc > segEnd) return None
            comps = (0 until nc).map { i =>
              val o = d + 6 + 3 * i
              Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0xf, u8(o + 2))
            }.toArray
            if (comps.exists(c => c.hSamp < 1 || c.hSamp > 2 ||
              c.vSamp < 1 || c.vSamp > 2)) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // extended/progressive/lossless/arithmetic
          case 0xdb =>
            var o = d
            while (o < segEnd) {
              if (o + 65 > segEnd) return None // truncated table
              val pq = u8(o) >> 4; val tq = u8(o) & 0xf
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              quant(tq) = (0 until 64).map(i => u8(o + 1 + i)).toArray
              o += 65
            }
          case 0xc4 =>
            var o = d
            while (o < segEnd) {
              if (o + 17 > segEnd) return None // truncated bit counts
              val tc = u8(o) >> 4; val th = u8(o) & 0xf
              if (th > 3) return None
              val bits = new Array[Int](17)
              (1 to 16).foreach(l => bits(l) = u8(o + l))
              val n = bits.sum
              if (o + 17 + n > segEnd) return None // truncated values
              val vals = (0 until n).map(i => u8(o + 17 + i)).toArray
              if (tc == 0) dcTabs(th) = new HuffDecode(bits, vals)
              else acTabs(th) = new HuffDecode(bits, vals)
              o += 17 + n
            }
          case 0xdd =>
            if (d + 2 > segEnd) return None
            restartInterval = u16(d)
          case 0xda =>
            if (comps == null) return None
            if (d + 1 > segEnd) return None
            val ns = u8(d)
            if (ns != comps.length) return None
            if (d + 1 + 2 * ns + 3 > segEnd) return None // truncated scan header
            (0 until ns).foreach { i =>
              val cid = u8(d + 1 + 2 * i)
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcTab = u8(d + 2 + 2 * i) >> 4
              c.acTab = u8(d + 2 + 2 * i) & 0xf
            }
            scanStart = pos + 2 + len
          case 0xd9 => return None // EOI before any scan
          case _ => () // APPn, COM, …
        }
        pos += 2 + len
      }
    }
    val maxH = comps.map(_.hSamp).max
    val maxV = comps.map(_.vSamp).max
    val mcuW = 8 * maxH; val mcuH = 8 * maxV
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    if (mcusX.toLong * mcusY > Int.MaxValue / 4 ||
      w.toLong * h > Int.MaxValue / 4) return None
    // per-component planes, padded to the MCU grid
    val planes = comps.map { c =>
      new Array[Int](mcusX * c.hSamp * 8 * mcusY * c.vSamp * 8)
    }
    for (c <- comps)
      if (quant(c.tq) == null || dcTabs(c.dcTab) == null ||
        acTabs(c.acTab) == null) return None
    val br = new BitReader(payload, scanStart)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart(rstIdx)) return None
        rstIdx = (rstIdx + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val planeW = mcusX * c.hSamp * 8
        var vy = 0
        while (vy < c.vSamp) {
          var vx = 0
          while (vx < c.hSamp) {
            java.util.Arrays.fill(coef, 0)
            val s = decodeHuff(br, dcTabs(c.dcTab))
            if (s < 0 || s > 11 || br.hitMarker) return None
            preds(ci) += extend(br.bits(s), s)
            coef(0) = preds(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = decodeHuff(br, acTabs(c.acTab))
              if (rs < 0 || br.hitMarker) return None
              if (rs == 0x00) k = 64 // EOB
              else if (rs == 0xf0) k += 16 // ZRL
              else {
                k += rs >> 4
                if (k > 63) return None
                val sz = rs & 0xf
                coef(zigzag(k)) = extend(br.bits(sz), sz) * q(k)
                k += 1
              }
            }
            val px0 = idct(coef)
            val bx0 = (mx * c.hSamp + vx) * 8
            val by0 = (my * c.vSamp + vy) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                planes(ci)((by0 + yy) * planeW + bx0 + xx) = px0(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            vx += 1
          }
          vy += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble: nearest-neighbor chroma upsampling (x·hᵢ/maxH)
    val rgb = new Array[Int](w * h)
    if (comps.length == 1) {
      val planeW = mcusX * comps(0).hSamp * 8
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = planes(0)(y * planeW + x)
          rgb(y * w + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
      Some(JpegPixels(w, h, gray = true, rgb))
    } else {
      val pw = comps.map(c => mcusX * c.hSamp * 8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def samp(i: Int): Int = {
            val sx = x * comps(i).hSamp / maxH
            val sy = y * comps(i).vSamp / maxV
            planes(i)(sy * pw(i) + sx)
          }
          val (r, g, b) = yccToRgb(samp(0), samp(1), samp(2))
          rgb(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      Some(JpegPixels(w, h, gray = false, rgb))
    }
  }

  // ----------------------------------------------------------------
  // Driver-verifiable face
  // ----------------------------------------------------------------

  /** Synthesize → JPEG-encode → REAL-decode a color image per row, with
    * a closed-form oracle: pixels are CONSTANT per 16×16 block (block
    * (bx, by) of doc i: r=(i+11bx+17by)%256, g=(3i+7bx+5by)%256,
    * b=(2i+13bx+3by)%256; w=16·(1+i%3), h=16·(1+i%2); odd ids encode
    * 4:2:0, even 4:4:4), and the quant tables are all ones — so every
    * block is DC-only, the DCT round-trip is BIT-EXACT, and the decoded
    * pixel is exactly [[yccToRgb]]∘[[rgbToYcc]] of the block color,
    * which the oracle computes with the same integer constants. Output:
    * per-doc decoded channel sums, position-weighted luma, the
    * [[Multimodal.aHash12]] fingerprint, and `jpeg_eq_closed` — every
    * decoded pixel compared against the closed form. A hash match
    * proves marker parse + Annex-K Huffman + MCU walk + dequant + IDCT
    * + subsampling + upsampling + fixed-point color conversion invert
    * the format exactly.
    */
  def syntheticJpegStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("w", "h", "subsampled", "n_px", "sum_r", "sum_g", "sum_b",
          "wluma", "ahash", "jpeg_eq_closed").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        // floorMod: a negative id must still yield positive dims and
        // 0..255 channels (encode's require would throw mid-task)
        val w = (16 * (1 + Math.floorMod(id, 3))).toInt
        val h = (16 * (1 + Math.floorMod(id, 2))).toInt
        val sub = Math.floorMod(id, 2) == 1
        def blockRgb(bx: Int, by: Int) =
          (Math.floorMod(id + 11 * bx + 17 * by, 256).toInt,
            Math.floorMod(3 * id + 7 * bx + 5 * by, 256).toInt,
            Math.floorMod(2 * id + 13 * bx + 3 * by, 256).toInt)
        val payload = encodeJpegColor(w, h,
          (x, y) => blockRgb(x / 16, y / 16), subsample420 = sub)
        val img = decodeJpeg(payload).getOrElse(
          throw new IllegalStateException(s"JPEG round-trip failed for id $id"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wl = 0L
        var eq = img.rgb.length == w * h
        val luma = new Array[Int](img.rgb.length)
        var i = 0
        while (i < img.rgb.length) {
          val x = i % w; val y = i / w
          val (er, eg, eb) = blockRgb(x / 16, y / 16)
          val (ey, ecb, ecr) = rgbToYcc(er, eg, eb)
          val (xr, xg, xb) = yccToRgb(ey, ecb, ecr) // the closed form
          val p = img.rgb(i)
          val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
          eq &&= pr == xr && pg == xg && pb == xb
          sr += pr; sg += pg; sb += pb
          luma(i) = (pr * 299 + pg * 587 + pb * 114) / 1000
          wl += i.toLong * luma(i)
          i += 1
        }
        Row.fromSeq(Seq(id, w.toLong, h.toLong, if (sub) 1L else 0L,
          img.rgb.length.toLong, sr, sg, sb, wl,
          Multimodal.aHash12(w, h, luma), if (eq) 1L else 0L))
      }
    }(enc)
  }
}
