package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** REAL, zero-dependency GIF codec — variable-width LZW with the full
  * dictionary lifecycle (clear/EOI codes, width growth to 12 bits,
  * 4096-entry cap), GIF87a/89a block walk (extensions skipped by their
  * sub-block chain), global and local color tables, and the 4-pass
  * interlace row order. Decodes the FIRST image frame (the curation
  * use: fingerprint/feature the still; multi-frame animation walks the
  * same block chain). GIF decode is LOSSLESS (palette indexes), so a
  * closed-form oracle pins every decoded pixel with no conversion
  * caveats at all — the strongest parity statement of the three image
  * codecs.
  */
object Gif extends Serializable {

  /** Decoded first frame: row-major from the top-left, packed
    * `(r << 16) | (g << 8) | b`.
    */
  final case class GifPixels(width: Int, height: Int, interlaced: Boolean,
      rgb: Array[Int])

  // ----------------------------------------------------------------
  // LZW
  // ----------------------------------------------------------------

  /** LZW-compress `indexes` (values < 2^minCodeSize) into GIF's
    * little-endian variable-width code stream (clear code emitted
    * first, EOI last, dictionary reset at 4096).
    */
  private def lzwEncode(indexes: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    var dict = scala.collection.mutable.Map.empty[List[Int], Int]
    var next = eoi + 1
    def reset(): Unit = {
      dict = scala.collection.mutable.Map.empty
      (0 until clear).foreach(i => dict(List(i)) = i)
      next = eoi + 1; width = minCodeSize + 1
    }
    put(clear); reset()
    var cur: List[Int] = Nil
    indexes.foreach { px =>
      val tryCur = px :: cur // reversed-prefix key (cheap prepend)
      if (dict.contains(tryCur)) cur = tryCur
      else {
        put(dict(cur))
        // the encoder's dictionary runs ONE entry ahead of the
        // decoder's (it adds on emit; the decoder adds one code later),
        // so width grows at (1<<width)+1 here vs (1<<width) there —
        // the standard GIF synchronization
        if (next < 4096) {
          dict(tryCur) = next; next += 1
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else { put(clear); reset() }
        cur = List(px)
      }
    }
    if (cur.nonEmpty) put(dict(cur))
    // the decoder adds one more dictionary entry AFTER the final data
    // code — if that add crosses a power-of-two boundary the decoder
    // reads EOI at the GROWN width, so mirror the growth here or a
    // stream whose last phrase lands exactly on the boundary (e.g. 64
    // identical pixels at minCodeSize 2) truncates its EOI
    if (next < 4096) {
      next += 1
      if (next == (1 << width) + 1 && width < 12) width += 1
    }
    put(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Decode a GIF LZW code stream back into pixel indexes (or None on
    * a corrupt stream: code beyond the dictionary, missing EOI data).
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Int](expected)
    var outPos = 0
    var acc = 0L; var nbits = 0; var pos = 0
    var width = minCodeSize + 1
    val dict = new Array[Array[Int]](4096)
    var next = 0
    def reset(): Unit = {
      (0 until clear).foreach(i => dict(i) = Array(i))
      next = eoi + 1; width = minCodeSize + 1
    }
    reset()
    var prev: Array[Int] = null
    while (true) {
      while (nbits < width) {
        if (pos >= data.length) return None // ran out before EOI
        acc |= (data(pos) & 0xffL) << nbits; nbits += 8; pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>= width; nbits -= width
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) {
        return if (outPos == expected) Some(out) else None
      } else {
        val entry: Array[Int] =
          if (code < next && dict(code) != null) dict(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK
          else return None
        if (outPos + entry.length > expected) return None
        System.arraycopy(entry, 0, out, outPos, entry.length)
        outPos += entry.length
        if (prev != null && next < 4096) {
          dict(next) = prev :+ entry(0); next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    None // unreachable
  }

  // ----------------------------------------------------------------
  // Encoder
  // ----------------------------------------------------------------

  /** Library-free GIF89a writer: one frame, a caller-supplied palette
    * (padded to the next power of two ≥ 2), `index(x, y)` < palette
    * size, optional interlacing. Fixture source [[decodeGif]] must
    * invert exactly.
    */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
      index: (Int, Int) => Int, interlaced: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1, s"dims ${width}x$height")
    require(palette.nonEmpty && palette.length <= 256, s"palette ${palette.length}")
    var bits = 1
    while ((1 << bits) < palette.length) bits += 1
    val palSize = 1 << bits
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(width); le16(height)
    out.write(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present, size
    out.write(0); out.write(0) // background, aspect
    (0 until palSize).foreach { i =>
      val c = if (i < palette.length) palette(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(width); le16(height)
    out.write(if (interlaced) 0x40 else 0x00)
    val rows: Array[Int] =
      if (!interlaced) (0 until height).toArray
      else ((0 until height by 8) ++ (4 until height by 8) ++
        (2 until height by 4) ++ (1 until height by 2)).toArray
    val idx = new Array[Int](width * height)
    var p = 0
    rows.foreach { y =>
      (0 until width).foreach { x => idx(p) = index(x, y); p += 1 }
    }
    val minCode = math.max(2, bits) // spec: min LZW code size ≥ 2
    out.write(minCode)
    val lzw = lzwEncode(idx, minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Decoder
  // ----------------------------------------------------------------

  /** Decode the first frame of a GIF87a/89a payload. Returns None
    * (never throws) on malformed headers, truncated streams, corrupt
    * LZW data, or an index outside the active color table.
    */
  def decodeGif(payload: Array[Byte]): Option[GifPixels] = {
    if (payload == null || payload.length < 14) return None
    val sig = new String(payload, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8(i: Int) = payload(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (frames carry their own dims)
    val flags = u8(pos); pos += 3
    var gct: Array[Int] = null
    if ((flags & 0x80) != 0) {
      val n = 1 << ((flags & 7) + 1)
      if (pos + 3 * n > payload.length) return None
      gct = (0 until n).map(i =>
        (u8(pos + 3 * i) << 16) | (u8(pos + 3 * i + 1) << 8) | u8(pos + 3 * i + 2)).toArray
      pos += 3 * n
    }
    while (pos < payload.length) {
      u8(pos) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-block chain
          pos += 2
          while (pos < payload.length && u8(pos) != 0) pos += 1 + u8(pos)
          if (pos >= payload.length) return None
          pos += 1
        case 0x2c =>
          if (pos + 10 > payload.length) return None
          val w = le16(pos + 5); val h = le16(pos + 7)
          val iflags = u8(pos + 9)
          pos += 10
          if (w < 1 || h < 1 || w.toLong * h > Int.MaxValue / 4) return None
          var table = gct
          if ((iflags & 0x80) != 0) {
            val n = 1 << ((iflags & 7) + 1)
            if (pos + 3 * n > payload.length) return None
            table = (0 until n).map(i =>
              (u8(pos + 3 * i) << 16) | (u8(pos + 3 * i + 1) << 8) | u8(pos + 3 * i + 2)).toArray
            pos += 3 * n
          }
          if (table == null) return None
          if (pos >= payload.length) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 11) return None
          val lzw = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (pos >= payload.length) return None
            val n = u8(pos); pos += 1
            if (n == 0) done = true
            else {
              if (pos + n > payload.length) return None
              lzw.write(payload, pos, n); pos += n
            }
          }
          val interlaced = (iflags & 0x40) != 0
          val idx = lzwDecode(lzw.toByteArray, minCode, w * h)
            .getOrElse(return None)
          if (idx.exists(_ >= table.length)) return None
          val rows =
            if (!interlaced) (0 until h).toArray
            else ((0 until h by 8) ++ (4 until h by 8) ++
              (2 until h by 4) ++ (1 until h by 2)).toArray
          val rgb = new Array[Int](w * h)
          var p = 0
          rows.foreach { y =>
            var x = 0
            while (x < w) { rgb(y * w + x) = table(idx(p)); p += 1; x += 1 }
          }
          return Some(GifPixels(w, h, interlaced, rgb))
        case _ => return None
      }
    }
    None
  }

  // ----------------------------------------------------------------
  // Driver-verifiable face
  // ----------------------------------------------------------------

  /** Synthesize → GIF-encode → REAL-decode an image per row. Pixels are
    * constant per 16×16 block (the [[Jpeg.syntheticJpegStats]] block
    * colors and dims — the three image codecs share one fixture
    * family); the palette lists the blocks' colors in (by, bx) order
    * and odd ids store INTERLACED. GIF is palette-lossless, so the
    * closed-form oracle pins every decoded pixel with zero conversion
    * caveats: the stats and fingerprint of the decoded frame must equal
    * the source function's exactly, and `gif_eq_closed` compares pixel
    * by pixel. A hash match proves the LZW dictionary lifecycle, the
    * block walk, and the interlace row order together.
    */
  def syntheticGifStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("w", "h", "interlaced", "n_px", "sum_r", "sum_g", "sum_b",
          "wluma", "ahash", "gif_eq_closed").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        // floorMod: a negative id must still yield positive dims and
        // 0..255 channels (encode's require would throw mid-task)
        val w = (16 * (1 + Math.floorMod(id, 3))).toInt
        val h = (16 * (1 + Math.floorMod(id, 2))).toInt
        val bw = w / 16
        def blockRgb(bx: Int, by: Int): Int =
          ((Math.floorMod(id + 11 * bx + 17 * by, 256).toInt << 16) |
            (Math.floorMod(3 * id + 7 * bx + 5 * by, 256).toInt << 8) |
            Math.floorMod(2 * id + 13 * bx + 3 * by, 256).toInt)
        val palette = (for (by <- 0 until h / 16; bx <- 0 until bw)
          yield blockRgb(bx, by)).toArray
        val payload = encodeGif(w, h, palette,
          (x, y) => (y / 16) * bw + (x / 16),
          interlaced = Math.floorMod(id, 2) == 1)
        val img = decodeGif(payload).getOrElse(
          throw new IllegalStateException(s"GIF round-trip failed for id $id"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wl = 0L
        var eq = img.rgb.length == w * h
        val luma = new Array[Int](img.rgb.length)
        var i = 0
        while (i < img.rgb.length) {
          val x = i % w; val y = i / w
          val p = img.rgb(i)
          eq &&= p == blockRgb(x / 16, y / 16)
          val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
          sr += pr; sg += pg; sb += pb
          luma(i) = (pr * 299 + pg * 587 + pb * 114) / 1000
          wl += i.toLong * luma(i)
          i += 1
        }
        Row.fromSeq(Seq(id, w.toLong, h.toLong, Math.floorMod(id, 2L),
          img.rgb.length.toLong, sr, sg, sb, wl,
          Multimodal.aHash12(w, h, luma), if (eq) 1L else 0L))
      }
    }(enc)
  }
}
