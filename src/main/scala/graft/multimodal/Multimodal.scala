package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference north star).
  *
  * Images / audio / video are opaque `binary` payloads plus a typed
  * metadata struct. The Spark-side plumbing — schema, partition-friendly
  * batch shape, per-partition decode boundary — is real and tested; the
  * actual codec step is a clearly-marked deterministic STUB (image/audio
  * libraries are not in this container). At cluster scale the decode step
  * is the same `mapPartitions` boundary with a real codec inside, sized so
  * one partition's payloads fit in executor memory
  * (`spark.sql.files.maxPartitionBytes` for the scan side).
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", StringType)))

  /** Attach an opaque payload column: here derived from text bytes (the
    * container has no real media), establishing the binary-column shape.
    */
  def withPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", to_binary(col(textCol), lit("utf-8")))

  /** Metadata extraction WITHOUT decoding: byte length + checksum are
    * codec-free; width/height come from a REAL PNG IHDR header parse
    * (pure byte arithmetic — no imaging library needed) with the
    * deterministic stub as the fallback for other formats.
    */
  def describePayload(df: DataFrame): DataFrame =
    df.withColumn("media_meta", struct(
      when(isPng(col("payload")), "image/png")
        .when(isGif(col("payload")), "image/gif")
        .when(isBmp(col("payload")), "image/bmp")
        .otherwise("application/octet-stream").as("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      coalesce(pngWidth(col("payload")), gifWidth(col("payload")),
        bmpWidth(col("payload")), stubWidth(col("payload"))).as("width"),
      coalesce(pngHeight(col("payload")), gifHeight(col("payload")),
        bmpHeight(col("payload")), stubHeight(col("payload"))).as("height"),
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

  /** Per-partition decode / feature-extract boundary. Batch shape: one
    * iterator pass, constant memory, no driver collect. The feature
    * vector here is a STUB (first-16-bytes histogram); a real pipeline
    * swaps `decodeOne` for the codec + model call.
    */
  def extractFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      // ??? real codec goes here — deterministic fake: byte histogram.
      val v = new Array[Float](dim)
      if (payload != null) payload.foreach(b => v((b & 0xff) % dim) += 1f)
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
