package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference north star).
  *
  * Images / audio / video are opaque `binary` payloads plus a typed
  * metadata struct. The Spark-side plumbing — schema, partition-friendly
  * batch shape, per-partition decode boundary — is real and tested, and so
  * is the uncompressed-format codec path: PNG/GIF/BMP/JPEG dimension
  * parsing and a full 24-bit BMP pixel encoder/decoder
  * ([[encodeBmp24]]/[[decodeBmp24]]), all library-free byte arithmetic.
  * Compressed codecs (JPEG pixel data etc.) fall back to a deterministic
  * byte histogram — those need real imaging libraries, absent from this
  * container. At cluster scale the decode step is the same `mapPartitions`
  * boundary with the full codec inside, sized so one partition's payloads
  * fit in executor memory (`spark.sql.files.maxPartitionBytes` for the
  * scan side).
  */
object Multimodal extends Serializable {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("checksum", StringType)))

  /** Attach an opaque payload column: here derived from text bytes (the
    * container has no real media), establishing the binary-column shape.
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", to_binary(col(textCol), lit("utf-8")))

  /** Metadata extraction WITHOUT decoding: byte length + checksum are
    * codec-free; width/height come from a REAL PNG IHDR header parse
    * (pure byte arithmetic — no imaging library needed) with the
    * deterministic stub as the fallback for other (image-shaped)
    * formats; WAV payloads get NULL dimensions and real sample-rate /
    * channel counts instead ([[isWav]]/[[wavSampleRate]]).
    */
  def describePayload(df: DataFrame): DataFrame =
    df.withColumn("media_meta", struct(
      when(isPng(col("payload")), "image/png")
        .when(isGif(col("payload")), "image/gif")
        .when(isBmp(col("payload")), "image/bmp")
        .when(isWav(col("payload")), "audio/wav")
        .when(isMp4(col("payload")), "video/mp4")
        .when(isOgg(col("payload")), "application/ogg")
        .otherwise("application/octet-stream").as("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      when(!isWav(col("payload")) && !isMp4(col("payload")) && !isOgg(col("payload")),
        coalesce(pngWidth(col("payload")), gifWidth(col("payload")),
          bmpWidth(col("payload")), stubWidth(col("payload")))).as("width"),
      when(!isWav(col("payload")) && !isMp4(col("payload")) && !isOgg(col("payload")),
        coalesce(pngHeight(col("payload")), gifHeight(col("payload")),
          bmpHeight(col("payload")), stubHeight(col("payload")))).as("height"),
      wavSampleRate(col("payload")).as("sample_rate"),
      wavChannels(col("payload")).as("channels"),
      md5(col("payload")).as("checksum")))

  /** PNG header sniff — real, library-free: the 8-byte signature, then
    * IHDR's big-endian width at bytes 17-20 and height at 21-24
    * (signature 8 + chunk length 4 + "IHDR" 4). Pure column expressions:
    * substring on binary + hex + base-16 conv, codegen end-to-end.
    */
  def isPng(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex(substring(payload, 1, 8)) === "89504E470D0A1A0A"

  /** Big-endian u32 read, assembled in LONG space: a crafted header with
    * the top bit set would make a direct cast("int") throw under ANSI
    * mode (killing the whole query for one bad payload). Out-of-spec
    * values (PNG caps dims at 2^31-1) come back NULL, not an error.
    */
  private def beU32Int(payload: org.apache.spark.sql.Column, pos: Int) = {
    val v = conv(hex(substring(payload, pos, 4)), 16, 10).cast("long")
    when(v <= Int.MaxValue, v.cast("int"))
  }

  def pngWidth(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isPng(payload) && octet_length(payload) >= 24, beU32Int(payload, 17))

  def pngHeight(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isPng(payload) && octet_length(payload) >= 24, beU32Int(payload, 21))

  /** GIF header sniff — also real and library-free: "GIF87a"/"GIF89a"
    * signature, then LITTLE-endian u16 width at bytes 7-8 and height at
    * 9-10 (assembled per byte; conv reads big-endian hex).
    */
  def isGif(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(payload, 1, 6).cast("string").isin("GIF87a", "GIF89a")

  private def leU16(payload: org.apache.spark.sql.Column, pos: Int) =
    (conv(hex(substring(payload, pos, 1)), 16, 10).cast("int") +
      conv(hex(substring(payload, pos + 1, 1)), 16, 10).cast("int") * 256)

  def gifWidth(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isGif(payload) && octet_length(payload) >= 10, leU16(payload, 7))

  def gifHeight(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isGif(payload) && octet_length(payload) >= 10, leU16(payload, 9))

  /** BMP header sniff: "BM" signature, BITMAPINFOHEADER little-endian
    * i32 width at byte 19 and height at 23 (1-based).
    */
  def isBmp(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(payload, 1, 2).cast("string") === "BM"

  /** Little-endian SIGNED i32 read (BMP dims are i32; a top-down BMP has
    * a NEGATIVE height, i.e. byte 4 ≥ 0x80). Assembled in LONG space —
    * byte3 * (1<<24) in Int arithmetic overflows for byte3 ≥ 0x80, which
    * under Spark 4's default ANSI mode throws instead of wrapping — then
    * mapped to the signed value explicitly before the narrowing cast.
    */
  private def leU32(payload: org.apache.spark.sql.Column, pos: Int) = {
    val u = (0 until 4).map(i =>
      conv(hex(substring(payload, pos + i, 1)), 16, 10).cast("long") * (1L << (8 * i)))
      .reduce(_ + _)
    when(u >= (1L << 31), u - (1L << 32)).otherwise(u).cast("int")
  }

  def bmpWidth(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isBmp(payload) && octet_length(payload) >= 26, leU32(payload, 19))

  def bmpHeight(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isBmp(payload) && octet_length(payload) >= 26, leU32(payload, 23))

  /** WAV header sniff — real, library-free: the RIFF container signature
    * plus the WAVE form type. Fixed-offset column expressions can read
    * the fmt fields only for the CANONICAL layout (fmt as the first
    * chunk, at byte 13); non-canonical chunk orders need the walk in
    * [[Audio.decodeWavPcm16]] at the mapPartitions boundary — exactly
    * the JPEG-SOF split.
    */
  def isWav(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(payload, 1, 4).cast("string") === "RIFF" &&
      substring(payload, 9, 4).cast("string") === "WAVE"

  private def isCanonicalWav(payload: org.apache.spark.sql.Column) =
    isWav(payload) && octet_length(payload) >= 36 &&
      substring(payload, 13, 4).cast("string") === "fmt "

  /** MP4 / ISO BMFF sniff — the `ftyp` box fourcc sits at a FIXED offset
    * (byte 5), so the type test is a column expression; dimensions and
    * duration need the variable-offset moov box walk in
    * [[Container.parseMp4]] at the mapPartitions boundary — the same
    * fixed-vs-walk split as JPEG-SOF and non-canonical WAV.
    */
  def isMp4(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    octet_length(payload) >= 12 && substring(payload, 5, 4).cast("string") === "ftyp"

  /** Ogg container sniff — "OggS" capture pattern at byte 1; stream
    * metadata needs the CRC-verified page walk in
    * [[Container.parseOggOpus]].
    */
  def isOgg(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(payload, 1, 4).cast("string") === "OggS"

  /** Sample rate from the canonical header (u32le at byte 25; real rates
    * are far below 2^31, so the signed read never wraps); NULL for
    * non-WAV or non-canonical layouts.
    */
  def wavSampleRate(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isCanonicalWav(payload), leU32(payload, 25))

  /** Channel count from the canonical header (u16le at byte 23). */
  def wavChannels(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isCanonicalWav(payload), leU16(payload, 23))

  /** STUB fallback for non-PNG payloads: deterministic fake dimensions
    * from payload size. A real deployment extends the header sniff per
    * format (JPEG SOF walks variable-length segments — that one needs the
    * mapPartitions boundary below, not a fixed-offset expression).
    */
  private def stubWidth(payload: org.apache.spark.sql.Column) =
    (octet_length(payload) % 640 + 1).cast("int")
  private def stubHeight(payload: org.apache.spark.sql.Column) =
    (octet_length(payload) % 480 + 1).cast("int")

  /** REAL JPEG dimension parse — segment walk to the SOF marker (JPEG
    * dims sit at a variable offset, so this lives at the mapPartitions
    * boundary, not in a fixed-offset expression). Returns (width,
    * height); None for non-JPEG / truncated payloads. Library-free.
    */
  def jpegDimensions(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (payload == null || payload.length < 4 ||
      u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < payload.length) {
      if (u8(i) != 0xff) return None // desynced — not a JPEG stream
      val marker = u8(i + 1)
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if ((marker >= 0xc0 && marker <= 0xcf)
          && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn: [len u16][precision u8][height u16][width u16]
        if (i + 8 >= payload.length) return None
        return Some((u16(i + 7), u16(i + 5)))
      } else {
        if (i + 3 >= payload.length) return None
        i += 2 + u16(i + 2)
      }
    }
    None
  }

  /** Adds real JPEG dimensions per partition (`jpeg_width`/`jpeg_height`,
    * null for non-JPEG): the same iterator boundary [[extractFeatures]]
    * uses — one pass, constant memory.
    */
  def withJpegDimensions(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("jpeg_width", IntegerType),
      StructField("jpeg_height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { r =>
        val dims = jpegDimensions(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq ++ Seq(dims.map(_._1).orNull, dims.map(_._2).orNull))
      }
    }(enc)
  }

  /** A decoded 24-bit bitmap: `width`×`height` pixels in row-major order
    * from the TOP-left (regardless of the file's bottom-up/top-down row
    * storage), each packed `(r << 16) | (g << 8) | b`.
    */
  final case class BmpPixels(width: Int, height: Int, rgb: Array[Int])

  /** REAL library-free 24-bit BMP writer (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, BI_RGB): rows padded to 4-byte boundaries, pixels
    * stored BGR, bottom-up unless `topDown` (negative height in the
    * header). `pixel(x, y)` returns (r, g, b) for the pixel at column x,
    * row y from the top. Used to synthesize deterministic fixtures that
    * [[decodeBmp24]] must invert exactly.
    */
  def encodeBmp24(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int),
      topDown: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1, s"dims ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(pos: Int, v: Int): Unit = (0 until 4).foreach(i =>
      out(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    def putLe16(pos: Int, v: Int): Unit = (0 until 2).foreach(i =>
      out(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize)            // file size
    putLe32(10, 54)                      // pixel data offset
    putLe32(14, 40)                      // info header size
    putLe32(18, width)
    putLe32(22, if (topDown) -height else height)
    putLe16(26, 1)                       // planes
    putLe16(28, 24)                      // bits per pixel
    putLe32(30, 0)                       // BI_RGB (uncompressed)
    putLe32(34, dataSize)
    putLe32(38, 2835); putLe32(42, 2835) // 72 dpi
    (0 until height).foreach { storedRow =>
      val y = if (topDown) storedRow else height - 1 - storedRow
      val base = 54 + storedRow * rowSize
      (0 until width).foreach { x =>
        val (r, g, b) = pixel(x, y)
        out(base + 3 * x) = (b & 0xff).toByte
        out(base + 3 * x + 1) = (g & 0xff).toByte
        out(base + 3 * x + 2) = (r & 0xff).toByte
      }
    }
    out
  }

  /** REAL library-free 24-bit BMP pixel decoder: validates the "BM"
    * signature, reads the pixel-data offset from the file header and the
    * i32 dimensions / 24-bpp / BI_RGB fields from BITMAPINFOHEADER,
    * honors 4-byte row padding and both row orders (positive height =
    * bottom-up, negative = top-down), and un-swizzles BGR → packed RGB.
    * Returns None (never throws) for non-BMP, compressed, non-24-bpp, or
    * truncated payloads.
    */
  def decodeBmp24(payload: Array[Byte]): Option[BmpPixels] = {
    if (payload == null || payload.length < 54 ||
      payload(0) != 'B'.toByte || payload(1) != 'M'.toByte) return None
    def u8(i: Int): Int = payload(i) & 0xff
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    val offset = le32(10)
    val infoSize = le32(14)
    val width = le32(18)
    val rawHeight = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (infoSize < 40 || bpp != 24 || compression != 0) return None
    val topDown = rawHeight < 0
    // abs in LONG space: rawHeight == Int.MinValue has no int abs
    val height = math.abs(rawHeight.toLong)
    if (width < 1 || height < 1 || offset < 54) return None
    // crafted headers can overflow width*3 / width*height in int space —
    // compute sizes in longs and reject anything a real payload can't
    // back (the length check below then stays meaningful)
    val rowSize = ((width.toLong * 3 + 3) / 4) * 4
    if (width.toLong * height > Int.MaxValue) return None
    if (payload.length.toLong < offset.toLong + rowSize * height) return None
    val h = height.toInt // safe: width*height ≤ Int.MaxValue and width ≥ 1
    val rgb = new Array[Int](width * h)
    (0 until h).foreach { storedRow =>
      val y = if (topDown) storedRow else h - 1 - storedRow
      val base = offset + storedRow * rowSize.toInt
      (0 until width).foreach { x =>
        rgb(y * width + x) =
          (u8(base + 3 * x + 2) << 16) | (u8(base + 3 * x + 1) << 8) | u8(base + 3 * x)
      }
    }
    Some(BmpPixels(width, h, rgb))
  }

  /** Exact integer pixel statistics from DECODED pixels — the
    * driver-verifiable face of the real codec: synthesize a deterministic
    * 24-bit BMP per id (pixel (x,y) of doc i has
    * r=(i+7x+13y)%256, g=(2i+11x+3y)%256, b=(3i+5x+17y)%256; odd ids
    * stored top-down, even bottom-up), round-trip it through
    * [[encodeBmp24]] → [[decodeBmp24]], and aggregate the decoded pixels:
    * channel sums, a position-weighted luminance sum (catches row-order
    * mistakes that orientation-invariant sums would miss), and an 8-bin
    * luminance histogram. All integer arithmetic — an oracle can compute
    * the same numbers from the closed-form pixel function without ever
    * seeing a BMP byte.
    *
    * Scale shape: one mapPartitions pass, constant memory per row, no
    * shuffle before the caller's aggregation/sort.
    */
  def syntheticBmpStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("w", "h", "n_px", "sum_r", "sum_g", "sum_b", "wluma").map(StructField(_, LongType)) ++:
        (0 until 8).map(i => StructField(s"lb$i", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val payload = encodeBmp24(w, h,
          (x, y) => (((id + 7 * x + 13 * y) % 256).toInt,
            ((2 * id + 11 * x + 3 * y) % 256).toInt,
            ((3 * id + 5 * x + 17 * y) % 256).toInt),
          topDown = id % 2 == 1)
        val img = decodeBmp24(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wl = 0L
        val bins = new Array[Long](8)
        var i = 0
        while (i < img.rgb.length) {
          val p = img.rgb(i)
          val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
          sr += pr; sg += pg; sb += pb
          val luma = (pr * 299 + pg * 587 + pb * 114) / 1000
          wl += i.toLong * luma // i = x + w*y in top-left row-major order
          bins(luma / 32) += 1L
          i += 1
        }
        Row.fromSeq(Seq(id, w.toLong, h.toLong, img.rgb.length.toLong, sr, sg, sb, wl)
          ++ bins.toSeq)
      }
    }(enc)
  }

  /** 12-bit average-hash over a decoded luminance plane: a 4×3 block
    * grid (block (bi,bj) covers x·4 div w = bi, y·3 div h = bj — every
    * block non-empty for w ≥ 4, h ≥ 3), bit set iff the block's mean
    * luma strictly exceeds the image mean. All-integer: the comparison
    * cross-multiplies (blockSum·nTotal > totalSum·nBlock), so no
    * division, no FP, and any engine reproduces the hash bit-for-bit.
    * `luma` is top-left row-major (index i = x + w·y).
    */
  def aHash12(w: Int, h: Int, luma: Array[Int]): Long = {
    require(w >= 4 && h >= 3, s"aHash12 needs w >= 4 and h >= 3, got ${w}x$h")
    val bSum = new Array[Long](12)
    val bCnt = new Array[Long](12)
    var total = 0L
    var i = 0
    while (i < luma.length) {
      val x = i % w; val y = i / w
      val b = (y * 3 / h) * 4 + (x * 4 / w)
      bSum(b) += luma(i); bCnt(b) += 1
      total += luma(i)
      i += 1
    }
    val n = luma.length.toLong
    var hash = 0L
    var b = 0
    while (b < 12) {
      if (bSum(b) * n > total * bCnt(b)) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Synthesize → encode → REAL-decode a BMP per row (the
    * [[syntheticBmpStats]] pixel function) and emit its [[aHash12]]
    * perceptual fingerprint plus the set-bit count. The hash is the
    * standard pre-filter for image near-dup dedup — downstream it
    * composes with exactly the hamming-distance pigeonhole blocking the
    * text side uses for SimHash (`operators.Dedup.simhashPairs`): 12
    * bits → band on bit segments, verify inside buckets only. Same
    * per-partition codec boundary as [[syntheticBmpStats]]: one
    * iterator pass, constant memory, no driver collect.
    */
  def syntheticBmpAHash(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("w", "h", "ahash", "n_on").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val payload = encodeBmp24(w, h,
          (x, y) => (((id + 7 * x + 13 * y) % 256).toInt,
            ((2 * id + 11 * x + 3 * y) % 256).toInt,
            ((3 * id + 5 * x + 17 * y) % 256).toInt),
          topDown = id % 2 == 1)
        val img = decodeBmp24(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        val luma = new Array[Int](img.rgb.length)
        var i = 0
        while (i < img.rgb.length) {
          val p = img.rgb(i)
          luma(i) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
            (p & 0xff) * 114) / 1000
          i += 1
        }
        val hash = aHash12(w, h, luma)
        Row.fromSeq(Seq(id, w.toLong, h.toLong, hash,
          java.lang.Long.bitCount(hash).toLong))
      }
    }(enc)
  }

  /** Image near-dup pairs: the [[syntheticBmpAHash]] fingerprint's
    * consumer. Hamming-≤-`maxHamming` pairs over the 12-bit aHash via
    * the SimHash pigeonhole blocking
    * ([[graft.operators.Dedup.simhashPairsFromSignatures]]): split the
    * hash into maxHamming+1 disjoint bit segments — any pair within the
    * radius agrees exactly on one segment — so candidates come from
    * equi-joins on segment keys and exact popcount verifies inside
    * buckets only, never an all-pairs cartesian. The signature table is
    * materialized once (localCheckpoint) so the codec boundary runs a
    * single pass however many band-joins read it. At 100 TB the
    * signature table is ~16 bytes/image — the bands shuffle signatures,
    * not pixels.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String,
      maxHamming: Int = 2): DataFrame =
    graft.operators.Dedup.simhashPairsFromSignatures(
      syntheticBmpAHash(df, idCol)
        .select(col(idCol), col("ahash").as("simhash"))
        .localCheckpoint(),
      idCol, maxHamming, bits = 12)

  /** Nearest-neighbor thumbnail resize over the REAL codec — the
    * "resize" stage of an image-curation pipeline: synthesize + encode +
    * [[decodeBmp24]] each source (the [[syntheticBmpStats]] pixel
    * function), map target pixel (tx, ty) to source (tx·w div tw,
    * ty·h div th) — the standard floor mapping, pure integer — then
    * RE-ENCODE the thumbnail and decode it AGAIN, so the emitted stats
    * prove the codec round-trips resized payloads too, not just the
    * originals. Output: source dims + exact integer channel sums and the
    * position-weighted luma of the thumbnail (i = tx + tw·ty), all
    * computable closed-form by an oracle that never sees a BMP byte.
    *
    * Same codec boundary shape as the other synthetic faces: one
    * mapPartitions pass, constant memory per row, no shuffle.
    */
  def syntheticBmpResize(df: DataFrame, idCol: String,
      tw: Int = 4, th: Int = 3): DataFrame = {
    require(tw >= 1 && th >= 1, s"target dims ${tw}x$th")
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("src_w", "src_h", "w", "h", "sum_r", "sum_g", "sum_b", "wluma")
          .map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val payload = encodeBmp24(w, h,
          (x, y) => (((id + 7 * x + 13 * y) % 256).toInt,
            ((2 * id + 11 * x + 3 * y) % 256).toInt,
            ((3 * id + 5 * x + 17 * y) % 256).toInt),
          topDown = id % 2 == 1)
        val img = decodeBmp24(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        // nearest-neighbor floor mapping into the decoded plane
        val thumb = Array.tabulate(tw * th) { i =>
          val tx = i % tw; val ty = i / tw
          img.rgb((ty * h / th) * w + (tx * w / tw))
        }
        // round-trip the RESIZED image through the codec before stats
        val thumbPayload = encodeBmp24(tw, th,
          (x, y) => { val p = thumb(y * tw + x)
            ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) },
          topDown = id % 2 == 0) // flip the row order vs the source
        val timg = decodeBmp24(thumbPayload).getOrElse(
          throw new IllegalStateException(s"thumb decode failed for id $id"))
        var sr = 0L; var sg = 0L; var sb = 0L; var wl = 0L
        var i = 0
        while (i < timg.rgb.length) {
          val p = timg.rgb(i)
          val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
          sr += pr; sg += pg; sb += pb
          wl += i.toLong * ((pr * 299 + pg * 587 + pb * 114) / 1000)
          i += 1
        }
        Row.fromSeq(Seq(id, w.toLong, h.toLong, tw.toLong, th.toLong,
          sr, sg, sb, wl))
      }
    }(enc)
  }

  /** Per-partition decode / feature-extract boundary. Batch shape: one
    * iterator pass, constant memory, no driver collect. BMP payloads get
    * REAL pixel features from [[decodeBmp24]], PNG from [[Png.decodePng]]
    * (zlib inflate) and baseline JPEG from [[Jpeg.decodeJpeg]] (Annex-K
    * Huffman + DCT) — mean R/G/B plus a (dim-3)-bin luminance histogram
    * from the decoded pixels; anything else (palette/progressive
    * remainders, non-image bytes) falls back to a deterministic byte
    * histogram — a real deployment swaps that fallback for the model
    * call at this same boundary.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 4, s"dim ($dim) must fit mean RGB + at least one luma bin")
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val v = new Array[Float](dim)
      if (payload == null) return v
      val pixels: Option[Array[Int]] =
        decodeBmp24(payload).map(_.rgb)
          .orElse(Png.decodePng(payload).map(_.argb.map(_ & 0xffffff)))
          .orElse(Jpeg.decodeJpeg(payload).map(_.rgb))
          .orElse(Gif.decodeGif(payload).map(_.rgb))
      pixels match {
        case Some(rgb) =>
          val n = rgb.length
          var sr = 0L; var sg = 0L; var sb = 0L
          rgb.foreach { p =>
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            val luma = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
            v(3 + luma * (dim - 3) / 256) += 1f
          }
          v(0) = sr.toFloat / n; v(1) = sg.toFloat / n; v(2) = sb.toFloat / n
        case None =>
          payload.foreach(b => v((b & 0xff) % dim) += 1f)
      }
      v
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ decodeOne(r.getAs[Array[Byte]](idx)).toSeq)
      }
    }(enc)
  }

  /** Frame-sampling shape for video-like payloads: explode k evenly-spaced
    * (stub) frame offsets per payload — the downstream per-frame pipeline
    * then treats frames as rows (the scalable layout: frame work
    * parallelizes across the cluster instead of per-video loops).
    */
  def sampleFrames(df: DataFrame, k: Int = 4): DataFrame =
    df.withColumn("frame_no", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame_offset",
        (col("frame_no") * octet_length(col("payload")).cast("long") / k).cast("long"))
}
