package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** REAL, zero-dependency PNG codec — the compressed-image slice of the
  * multimodal waiver closed: PNG's IDAT stream is zlib, and
  * `java.util.zip.{Deflater, Inflater}` ship in the JDK, so full pixel
  * decode needs no external library. Covers the COMPLETE static-PNG
  * surface: all five color types (0 gray, 2 truecolor, 3 palette with
  * optional tRNS alpha, 4 gray+alpha, 6 truecolor+alpha) at every
  * legal bit depth (1/2/4/8/16 gray, 1/2/4/8 palette, 8/16 for the
  * multi-channel types — 16-bit samples downscale to their high byte,
  * sub-byte gray scales over the depth's range); BOTH interlace
  * methods (none and Adam7's seven passes); and all FIVE scanline
  * filters (None/Sub/Up/Average/Paeth) on every path. Malformed or
  * illegal payloads return None (never throw); Opus compressed audio
  * is the engine's one remaining codec waiver.
  *
  * Reference anchor: the reference stores tweet media as opaque URLs and
  * never decodes anything (SURVEY §2.7); this codec is what an image
  * quality/dedup pipeline at 100 TB runs INSIDE the per-partition
  * boundary — pixels never shuffle, only the derived stats/fingerprints
  * do (the [[Multimodal.syntheticBmpStats]] scale shape).
  */
object Png extends Serializable {

  /** Decoded PNG pixels, row-major from the top-left, each packed
    * `(a << 24) | (r << 16) | (g << 8) | b` (alpha 255 for RGB
    * payloads). `hasAlpha` records the source color type.
    */
  final case class PngPixels(width: Int, height: Int, hasAlpha: Boolean,
      argb: Array[Int])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (the PNG spec's exact tie-break order: left,
    * then up, then up-left).
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue
  }

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc32(t, data))
  }

  /** Adam7 pass geometry: (x0, y0, dx, dy) per pass — the PNG spec's
    * starting_col/starting_row/col_increment/row_increment tables.
    */
  private val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pixels of coordinate `o, o+s, o+2s, …` inside `[0, total)`. */
  private def passDim(total: Int, o: Int, s: Int): Int =
    if (total > o) (total - o + s - 1) / s else 0

  /** Library-free PNG writer: 8-bit color type 2 (RGB) or 6 (RGBA),
    * non-interlaced — the original fixture face; see [[encodePngExt]]
    * for palette / 16-bit / Adam7 variants.
    */
  def encodePng(width: Int, height: Int, colorType: Int,
      pixel: (Int, Int) => (Int, Int, Int, Int),
      rowFilter: Int => Int = _ => 0): Array[Byte] =
    encodePngExt(width, height, colorType, 8, interlaced = false,
      pixel, rowFilter)

  /** Full-variant library-free PNG writer: color types 0 (gray — the
    * red channel), 2 (RGB), 3 (palette, built from the image's distinct
    * colors in row-major first-occurrence order, capped by the depth),
    * 4 (gray+alpha), 6 (RGBA); every legal bit depth (sub-byte samples
    * pack MSB-first and the fixture's values must fit the depth;
    * 16-bit low bytes are a deterministic function of the sample so
    * fixtures are stable and the MSB reduction is observable);
    * interlace none or Adam7.
    * `rowFilter(y)` picks each GLOBAL scanline's filter (mod 5) — in
    * Adam7 every pass row maps to a distinct global y, so the rotation
    * exercises all five filters across passes too. Used to synthesize
    * deterministic fixtures [[decodePng]] must invert exactly.
    */
  def encodePngExt(width: Int, height: Int, colorType: Int, bitDepth: Int,
      interlaced: Boolean,
      pixel: (Int, Int) => (Int, Int, Int, Int),
      rowFilter: Int => Int = _ => 0): Array[Byte] = {
    require(width >= 1 && height >= 1, s"dims ${width}x$height")
    require(Set(0, 2, 3, 4, 6)(colorType), s"colorType $colorType")
    val validDepths: Set[Int] = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    require(validDepths(bitDepth), s"bitDepth $bitDepth for type $colorType")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // palette: distinct colors in row-major first-occurrence order
    var pal: Array[Int] = null
    var palIdx: Map[Int, Int] = null
    if (colorType == 3) {
      val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
      for (y <- 0 until height; x <- 0 until width) {
        val (r, g, b, _) = pixel(x, y)
        val c = (r << 16) | (g << 8) | b
        if (!seen.contains(c)) seen(c) = seen.size
      }
      val cap = 1 << math.min(bitDepth, 8)
      require(seen.size <= cap,
        s"palette PNG at depth $bitDepth needs <=$cap colors, got ${seen.size}")
      pal = seen.keysIterator.toArray
      palIdx = seen.toMap
    }
    val bps = math.max(1, bitDepth / 8)
    val bitsPP = channels * bitDepth
    val fbpp = math.max(1, bitsPP / 8) // filter byte distance
    val passes = if (interlaced) Adam7 else Array((0, 0, 1, 1))
    val filtered = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = passDim(width, x0, dx); val ph = passDim(height, y0, dy)
      if (pw > 0 && ph > 0) {
        val stride = (pw * bitsPP + 7) / 8
        var prev = new Array[Byte](stride)
        (0 until ph).foreach { py =>
          val gy = y0 + py * dy
          val cur = new Array[Byte](stride)
          (0 until pw).foreach { px =>
            val gx = x0 + px * dx
            val (r, g, b, a) = pixel(gx, gy)
            def put(ch: Int, v: Int): Unit = {
              cur(px * channels * bps + ch * bps) = v.toByte
              // 16-bit low byte: deterministic, distinct from the MSB,
              // so a decoder that read the wrong byte fails the parity
              if (bps == 2)
                cur(px * channels * bps + ch * bps + 1) =
                  ((v * 73 + 11) % 256).toByte
            }
            if (bitDepth < 8) {
              // single-channel sub-byte: the fixture contract is that
              // gray values / palette indexes fit the depth
              val v = if (colorType == 3) palIdx((r << 16) | (g << 8) | b)
                else r
              require(v < (1 << bitDepth),
                s"sample $v exceeds depth-$bitDepth domain")
              val bitpos = px * bitDepth
              cur(bitpos >> 3) = (cur(bitpos >> 3) |
                (v << (8 - bitDepth - (bitpos & 7)))).toByte
            } else colorType match {
              case 0 => put(0, r)
              case 2 => put(0, r); put(1, g); put(2, b)
              case 3 => cur(px * channels * bps) =
                palIdx((r << 16) | (g << 8) | b).toByte
              case 4 => put(0, r); put(1, a)
              case 6 => put(0, r); put(1, g); put(2, b); put(3, a)
            }
          }
          val f = math.floorMod(rowFilter(gy), 5)
          filtered.write(f)
          val row = new Array[Byte](stride)
          (0 until stride).foreach { i =>
            val left = if (i >= fbpp) cur(i - fbpp) & 0xff else 0
            val up = prev(i) & 0xff
            val upLeft = if (i >= fbpp) prev(i - fbpp) & 0xff else 0
            val pred = f match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case 4 => paeth(left, up, upLeft)
            }
            row(i) = ((cur(i) & 0xff) - pred).toByte
          }
          filtered.write(row)
          prev = cur
        }
      }
    }
    val defl = new java.util.zip.Deflater()
    val idat = try {
      defl.setInput(filtered.toByteArray); defl.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
      bos.toByteArray
    } finally defl.end()
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](bitDepth.toByte, colorType.toByte, 0, 0,
        if (interlaced) 1 else 0)
    val plte =
      if (pal == null) Array.empty[Byte]
      else chunk("PLTE", pal.flatMap(c => Array(
        ((c >> 16) & 0xff).toByte, ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)))
    Signature ++ chunk("IHDR", ihdr) ++ plte ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** REAL library-free PNG pixel decoder: validates the signature,
    * walks the chunk stream verifying every chunk's CRC32, parses IHDR
    * (ALL static-PNG color types 0/2/3/4/6 at every legal bit depth —
    * 1/2/4/8/16 gray, 1/2/4/8 palette, 8/16 for the multi-channel
    * types — and both interlace methods), PLTE and type-3 tRNS,
    * concatenates the IDAT chunks, inflates the zlib stream with
    * `java.util.zip.Inflater`, un-filters each scanline of each pass
    * (all five filter types, exact Paeth tie-breaks; Adam7 scatters
    * each pass into place) and packs ARGB — 16-bit samples reduce to
    * their high byte, sub-byte gray scales over the depth's range.
    * Returns None (never throws) on malformed, truncated,
    * CRC-corrupted payloads, missing PLTE, illegal depth/type combos,
    * or out-of-range palette indexes.
    */
  def decodePng(payload: Array[Byte]): Option[PngPixels] = {
    if (payload == null || payload.length < Signature.length + 12) return None
    if (!Signature.indices.forall(i => payload(i) == Signature(i))) return None
    def u8(i: Int): Int = payload(i) & 0xff
    def beU32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    var pos = Signature.length
    var width = -1; var height = -1; var colorType = -1
    var bitDepth = -1; var interlace = 0
    var palette: Array[Int] = null
    var trns: Array[Int] = null
    var ok = true; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (ok && !sawEnd && pos + 12 <= payload.length) {
      val len = beU32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > payload.length) ok = false
      else {
        val typ = new String(payload, pos + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val dataStart = pos + 8
        val dataLen = len.toInt
        val c = new java.util.zip.CRC32
        c.update(payload, pos + 4, 4 + dataLen)
        if (c.getValue != beU32(dataStart + dataLen)) ok = false
        else {
          typ match {
            case "IHDR" =>
              if (dataLen != 13) ok = false
              else {
                width = beU32(dataStart).toInt
                height = beU32(dataStart + 4).toInt
                bitDepth = u8(dataStart + 8)
                colorType = u8(dataStart + 9)
                val comp = u8(dataStart + 10); val filt = u8(dataStart + 11)
                interlace = u8(dataStart + 12)
                val depthOk = colorType match {
                  case 0 => Set(1, 2, 4, 8, 16)(bitDepth)
                  case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
                  case 3 => Set(1, 2, 4, 8)(bitDepth)
                  case _ => false
                }
                if (!depthOk || comp != 0 || filt != 0 ||
                  (interlace != 0 && interlace != 1)) ok = false
              }
            case "PLTE" =>
              if (dataLen == 0 || dataLen % 3 != 0 || dataLen > 768) ok = false
              else palette = Array.tabulate(dataLen / 3)(j =>
                (u8(dataStart + 3 * j) << 16) |
                  (u8(dataStart + 3 * j + 1) << 8) | u8(dataStart + 3 * j + 2))
            case "tRNS" =>
              // palette alpha; the gray/truecolor transparent-color-key
              // form is ancillary to the stats pipeline — skipped
              if (colorType == 3) {
                if (palette == null || dataLen > palette.length) ok = false
                else trns = Array.tabulate(dataLen)(j => u8(dataStart + j))
              }
            case "IDAT" => idat.write(payload, dataStart, dataLen)
            case "IEND" => sawEnd = true
            case _ => () // ancillary chunks (tEXt, pHYs, …) skip
          }
          pos = dataStart + dataLen + 4
        }
      }
    }
    if (!ok || !sawEnd || width < 1 || height < 1) return None
    if (colorType == 3 && palette == null) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val bps = math.max(1, bitDepth / 8)
    val bitsPP = channels * bitDepth
    val fbpp = math.max(1, bitsPP / 8) // filter byte distance
    // crafted headers can overflow the buffer sizing in int space —
    // guard in longs (the decodeBmp24 lesson)
    if (width.toLong * height > Int.MaxValue / 4) return None
    val passes = if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    var expectedL = 0L
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = passDim(width, x0, dx); val ph = passDim(height, y0, dy)
      if (pw > 0 && ph > 0)
        expectedL += ph.toLong * ((pw.toLong * bitsPP + 7) / 8 + 1)
    }
    if (expectedL > Int.MaxValue / 2) return None
    val expected = expectedL.toInt
    val raw = new Array[Byte](expected)
    val infl = new java.util.zip.Inflater()
    try {
      infl.setInput(idat.toByteArray)
      var off = 0
      while (off < expected && !infl.finished()) {
        val n =
          try infl.inflate(raw, off, expected - off)
          catch { case _: java.util.zip.DataFormatException => return None }
        // truncated stream / preset-dictionary demand: nothing more to give
        if (n == 0 && (infl.needsInput() || infl.needsDictionary())) return None
        off += n
      }
      if (off != expected) return None
    } finally infl.end()
    val argb = new Array[Int](width * height)
    var off = 0
    var passI = 0
    // while, not foreach: the malformed-payload returns below must stay
    // method-local (no NonLocalReturnControl through a closure)
    while (passI < passes.length) {
      val (x0, y0, dx, dy) = passes(passI)
      passI += 1
      val pw = passDim(width, x0, dx); val ph = passDim(height, y0, dy)
      if (pw > 0 && ph > 0) {
        val stride = (pw * bitsPP + 7) / 8
        val prev = new Array[Int](stride)
        val cur = new Array[Int](stride)
        java.util.Arrays.fill(prev, 0)
        var py = 0
        while (py < ph) {
          val f = raw(off) & 0xff
          if (f > 4) return None
          var i = 0
          while (i < stride) {
            val left = if (i >= fbpp) cur(i - fbpp) else 0
            val up = prev(i)
            val upLeft = if (i >= fbpp) prev(i - fbpp) else 0
            val pred = f match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case 4 => paeth(left, up, upLeft)
            }
            cur(i) = ((raw(off + 1 + i) & 0xff) + pred) & 0xff
            i += 1
          }
          var px = 0
          while (px < pw) {
            val packed = if (bitDepth < 8) {
              // single-channel sub-byte sample, MSB-first in each byte
              val bitpos = px * bitDepth
              val v = (cur(bitpos >> 3) >> (8 - bitDepth - (bitpos & 7))) &
                ((1 << bitDepth) - 1)
              if (colorType == 3) {
                if (v >= palette.length) return None
                val a = if (trns != null && v < trns.length) trns(v) else 255
                (a << 24) | palette(v)
              } else {
                // gray: scale to 8-bit over the depth's full range
                val g = v * 255 / ((1 << bitDepth) - 1)
                (255 << 24) | (g << 16) | (g << 8) | g
              }
            } else {
              val base = px * channels * bps
              // 16-bit: the high byte is sample 0 of each channel pair
              def s(ch: Int): Int = cur(base + ch * bps)
              colorType match {
                case 0 => val v = s(0); (255 << 24) | (v << 16) | (v << 8) | v
                case 2 => (255 << 24) | (s(0) << 16) | (s(1) << 8) | s(2)
                case 3 =>
                  val idx = cur(base)
                  if (idx >= palette.length) return None
                  val a = if (trns != null && idx < trns.length) trns(idx) else 255
                  (a << 24) | palette(idx)
                case 4 => val v = s(0)
                  (s(1) << 24) | (v << 16) | (v << 8) | v
                case 6 => (s(3) << 24) | (s(0) << 16) | (s(1) << 8) | s(2)
              }
            }
            argb((y0 + py * dy) * width + (x0 + px * dx)) = packed
            px += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          off += stride + 1
          py += 1
        }
      }
    }
    Some(PngPixels(width, height,
      colorType == 6 || colorType == 4 || (colorType == 3 && trns != null),
      argb))
  }

  /** Synthesize → PNG-encode → REAL-decode an image per row and prove
    * PARITY with the BMP path: pixel (x,y) of doc i is the
    * [[Multimodal.syntheticBmpStats]] closed form, the CONTAINER
    * rotates by id so the corpus exercises every supported variant —
    * color type by id%4 (0→truecolor, 1→RGBA with alpha
    * (i+9x+21y)%256, 2→palette via PLTE, 3→16-bit truecolor whose low
    * bytes the decoder must discard), Adam7 interlace on id%3==2, and
    * the per-scanline filter rotates (y+i)%5 — and the decoded pixels
    * reduce to the same exact integer stats the BMP rows verify:
    * channel sums (incl. alpha), position-weighted luma, the
    * [[Multimodal.aHash12]] fingerprint, plus `png_eq_bmp`: the
    * decoded RGB plane compared byte-for-byte against
    * [[Multimodal.decodeBmp24]] of the BMP twin of the same pixels —
    * independent of which PNG container carried them. An oracle
    * computes everything closed-form without seeing a PNG byte, so a
    * hash match proves the zlib inflate + per-pass un-filtering +
    * palette/MSB reduction inverts every variant exactly. Same scale
    * shape as the BMP rows: one mapPartitions pass, constant memory,
    * pixels never shuffle.
    */
  def syntheticPngParity(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("w", "h", "color_type", "bit_depth", "interlaced", "n_px",
          "sum_r", "sum_g", "sum_b", "sum_a", "wluma", "ahash",
          "png_eq_bmp").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val colorType = (id % 4) match {
          case 0 => 2; case 1 => 6; case 2 => 3; case _ => 2
        }
        val bitDepth = if (id % 4 == 3) 16 else 8
        val interlaced = id % 3 == 2
        def rgb(x: Int, y: Int) = (((id + 7 * x + 13 * y) % 256).toInt,
          ((2 * id + 11 * x + 3 * y) % 256).toInt,
          ((3 * id + 5 * x + 17 * y) % 256).toInt)
        val payload = encodePngExt(w, h, colorType, bitDepth, interlaced,
          (x, y) => {
            val (pr, pg, pb) = rgb(x, y)
            (pr, pg, pb, ((id + 9 * x + 21 * y) % 256).toInt)
          },
          y => ((y + id) % 5).toInt)
        val img = decodePng(payload).getOrElse(
          throw new IllegalStateException(s"PNG round-trip failed for id $id"))
        val bmp = Multimodal.decodeBmp24(
          Multimodal.encodeBmp24(w, h, rgb, topDown = id % 2 == 1)).getOrElse(
          throw new IllegalStateException(s"BMP round-trip failed for id $id"))
        var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L; var wl = 0L
        var eqBmp = img.argb.length == bmp.rgb.length
        val luma = new Array[Int](img.argb.length)
        var i = 0
        while (i < img.argb.length) {
          val p = img.argb(i)
          val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
          sr += pr; sg += pg; sb += pb; sa += (p >>> 24)
          luma(i) = (pr * 299 + pg * 587 + pb * 114) / 1000
          wl += i.toLong * luma(i)
          eqBmp &&= (p & 0xffffff) == bmp.rgb(i)
          i += 1
        }
        Row.fromSeq(Seq(id, w.toLong, h.toLong, colorType.toLong,
          bitDepth.toLong, if (interlaced) 1L else 0L,
          img.argb.length.toLong, sr, sg, sb, sa, wl,
          Multimodal.aHash12(w, h, luma), if (eqBmp) 1L else 0L))
      }
    }(enc)
  }
}
