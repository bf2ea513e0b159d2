package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Library-free compressed-container METADATA sniffers — the third leg of
  * the multimodal story after BMP pixels ([[Multimodal]]) and WAV samples
  * ([[Audio]]): real dimension-and-duration extraction for MP4 (ISO BMFF,
  * public ISO/IEC 14496-12 box layout) and Ogg-Opus (RFC 3533 pages +
  * RFC 7845 OpusHead), without decoding a single compressed sample.
  *
  * This is the honest boundary for video/compressed audio at 100 TB: the
  * moov box walk / page walk is pure byte arithmetic over a variable-length
  * layout, so it lives at the `mapPartitions` boundary exactly like the
  * JPEG SOF segment walk (`Multimodal.jpegDimensions`) — one iterator
  * pass, constant memory, no shuffle. Sample/frame DECODE (H.264, Opus
  * audio) genuinely needs media libraries absent from this container; a
  * real deployment swaps them in at this same boundary.
  *
  * Both parsers return None — never throw — on anything malformed: sizes
  * are checked in LONG space so crafted u32/u64 box sizes can't overflow
  * the bounds math, and Ogg pages must pass their REAL CRC-32 (poly
  * 0x04C11DB7, unreflected, init/xorout 0 — computed over the page with
  * the checksum field zeroed) before any field is believed.
  */
object Container extends Serializable {

  // ------------------------------------------------------------------
  // MP4 / ISO BMFF
  // ------------------------------------------------------------------

  /** Movie-level metadata from the moov box walk. Width/height are the
    * tkhd 16.16 fixed-point values, integer part only.
    */
  final case class Mp4Meta(
      brand: String,
      timescale: Long,
      duration: Long,
      width: Int,
      height: Int,
      handler: String,
      nTopBoxes: Int)

  private def putBe32(out: Array[Byte], pos: Int, v: Long): Unit =
    (0 until 4).foreach(i => out(pos + i) = ((v >> (8 * (3 - i))) & 0xff).toByte)
  private def putBe64(out: Array[Byte], pos: Int, v: Long): Unit =
    (0 until 8).foreach(i => out(pos + i) = ((v >> (8 * (7 - i))) & 0xff).toByte)
  private def putAscii(out: Array[Byte], pos: Int, s: String): Unit =
    s.indices.foreach(i => out(pos + i) = s.charAt(i).toByte)

  private def box(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    putBe32(out, 0, 8L + payload.length)
    putAscii(out, 4, fourcc)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** The identity 3x3 transform matrix every *hd box carries (16.16 /
    * 2.30 fixed point): diag(1, 1, 1).
    */
  private def unityMatrix(out: Array[Byte], pos: Int): Unit = {
    putBe32(out, pos, 0x00010000L)
    putBe32(out, pos + 16, 0x00010000L)
    putBe32(out, pos + 32, 0x40000000L)
  }

  /** REAL minimal-but-valid MP4 writer: ftyp + moov(mvhd + trak(tkhd +
    * mdia(mdhd + hdlr))) + free + mdat. `version` selects the 32-bit (0)
    * or 64-bit (1) mvhd/tkhd time fields — version 1 is how real muxers
    * write durations past 2^32 ticks, and the parser must honor both.
    * Width/height land in tkhd as 16.16 fixed point.
    */
  def encodeMp4(brand: String, timescale: Long, duration: Long,
      width: Int, height: Int, version: Int = 0): Array[Byte] = {
    require(version == 0 || version == 1, s"mvhd version $version")
    require(timescale >= 1 && duration >= 0, s"timescale $timescale / duration $duration")
    require(version == 1 || duration < (1L << 32), "32-bit duration overflow needs version 1")
    require(brand.length == 4, s"brand '$brand' must be a 4cc")

    val ftypPayload = new Array[Byte](8) // brand + minor_version(0)
    putAscii(ftypPayload, 0, brand)
    val ftyp = box("ftyp", ftypPayload)

    val mvhd = {
      val p = new Array[Byte](if (version == 1) 112 else 100)
      p(0) = version.toByte
      if (version == 1) { putBe32(p, 20, timescale); putBe64(p, 24, duration) }
      else { putBe32(p, 12, timescale); putBe32(p, 16, duration) }
      val m = if (version == 1) 32 else 20 // offset of the rate field
      putBe32(p, m, 0x00010000L)           // rate 1.0
      p(m + 4) = 0x01                      // volume 1.0 (8.8 fixed)
      unityMatrix(p, m + 16)
      putBe32(p, p.length - 4, 2L)         // next_track_ID
      box("mvhd", p)
    }

    val tkhd = {
      val p = new Array[Byte](if (version == 1) 96 else 84)
      p(0) = version.toByte
      p(3) = 0x03 // enabled | in_movie
      if (version == 1) { putBe32(p, 20, 1L); putBe64(p, 28, duration) }
      else { putBe32(p, 12, 1L); putBe32(p, 20, duration) }
      unityMatrix(p, if (version == 1) 52 else 40)
      putBe32(p, p.length - 8, width.toLong << 16)
      putBe32(p, p.length - 4, height.toLong << 16)
      box("tkhd", p)
    }

    val mdhd = {
      val p = new Array[Byte](24)
      putBe32(p, 12, timescale)
      putBe32(p, 16, if (version == 1) 0L else duration)
      p(20) = 0x55; p(21) = 0xc4.toByte // packed 5-bit 'und'
      box("mdhd", p)
    }
    val hdlr = {
      val p = new Array[Byte](26) // ver/flags + predefined + type + 12 res + "g\0"
      putAscii(p, 8, "vide")
      p(24) = 'g'
      box("hdlr", p)
    }
    val mdia = box("mdia", mdhd ++ hdlr)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val free = box("free", Array.emptyByteArray)
    val mdat = box("mdat", Array.tabulate(16)(i => ((i * 37 + 11) & 0xff).toByte))
    ftyp ++ moov ++ free ++ mdat
  }

  /** REAL ISO BMFF box walk: validates `ftyp` at byte 4, walks top-level
    * boxes (honoring size==1 → 64-bit largesize and size==0 → to-EOF),
    * descends moov → mvhd (version-dependent timescale/duration offsets)
    * and moov → trak → tkhd / mdia → hdlr. Returns None for anything
    * that isn't a well-formed movie (missing moov/mvhd/tkhd/hdlr,
    * truncated or over-running box sizes, sizes past 2^63).
    */
  def parseMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 16) return None
    def u8(i: Long): Int = payload(i.toInt) & 0xff
    def be32(i: Long): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Long): String = new String(payload, i.toInt, 4, "US-ASCII")

    /** Walk boxes in [start, end); call f(type, bodyStart, bodyEnd) per
      * box; false on any malformed size.
      */
    def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val size32 = be32(pos)
        var hdr = 8L
        var size = size32
        if (size32 == 1L) {
          if (pos + 16 > end) return false
          size = be64(pos + 8); hdr = 16L
          if (size < 0) return false // crafted u64 with the top bit set
        } else if (size32 == 0L) size = end - pos
        if (size < hdr || pos + size > end) return false
        f(fourcc(pos + 4), pos + hdr, pos + size)
        pos += size
      }
      pos == end
    }

    if (fourcc(4) != "ftyp" || be32(0) < 16) return None
    val brand = fourcc(8)
    var nTop = 0
    var moov: Option[(Long, Long)] = None
    if (!walk(0, payload.length) { (t, b, e) =>
      nTop += 1
      if (t == "moov" && moov.isEmpty) moov = Some((b, e))
    }) return None

    moov.flatMap { case (ms, me) =>
      var timescale = -1L; var duration = -1L
      var width = -1; var height = -1; var handler: String = null
      def fixed16(v: Long): Int = (v >> 16).toInt
      val ok = walk(ms, me) {
        case ("mvhd", b, e) if e - b >= 20 =>
          if (u8(b) == 1) {
            // a version-1 mvhd needs a >=32-byte body (64-bit times); a
            // shorter one is malformed — leave timescale/duration unset
            // (rejecting the file) rather than reading version-0 offsets
            // out of what are reserved bytes in the v1 layout
            if (e - b >= 32) { timescale = be32(b + 20); duration = be64(b + 24) }
          } else { timescale = be32(b + 12); duration = be32(b + 16) }
        case ("trak", tb, te) =>
          walk(tb, te) {
            case ("tkhd", b, e) if e - b >= 84 =>
              val v1 = u8(b) == 1
              if (!v1 || e - b >= 96) {
                val wOff = if (v1) b + 88 else b + 76
                width = fixed16(be32(wOff)); height = fixed16(be32(wOff + 4))
              }
            case ("mdia", mb, mev) =>
              walk(mb, mev) {
                case ("hdlr", b, e) if e - b >= 12 => handler = fourcc(b + 8)
                case _ =>
              }
            case _ =>
          }
        case _ =>
      }
      if (ok && timescale >= 1 && duration >= 0 && width >= 0 && handler != null)
        Some(Mp4Meta(brand, timescale, duration, width, height, handler, nTop))
      else None
    }
  }

  // ------------------------------------------------------------------
  // Ogg / Opus
  // ------------------------------------------------------------------

  /** Stream metadata from the Ogg page walk + the BOS page's OpusHead. */
  final case class OggOpusMeta(
      serial: Long,
      nPages: Int,
      channels: Int,
      preSkip: Int,
      inputSampleRate: Long,
      lastGranule: Long)

  /** Ogg page CRC-32: poly 0x04C11DB7, no reflection, init 0, xorout 0
    * (RFC 3533 §6) — NOT the zlib CRC. Computed over the whole page with
    * the 4 checksum bytes zeroed.
    */
  private val crcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) { r = (r << 1) ^ (if ((r & 0x80000000) != 0) 0x04c11db7 else 0); k += 1 }
    r
  }

  def oggCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = off
    while (i < off + len) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  private def oggPage(headerType: Int, granule: Long, serial: Long, seq: Long,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    // one lacing value per packet; a 255-multiple length needs a 0 lace
    val lacing = packets.flatMap { p =>
      Seq.fill(p.length / 255)(255) ++ Seq(p.length % 255)
    }
    require(lacing.size <= 255, s"${lacing.size} lacing values exceed one page")
    val body = packets.toArray.flatten
    val out = new Array[Byte](27 + lacing.size + body.length)
    putAscii(out, 0, "OggS")
    out(5) = headerType.toByte
    (0 until 8).foreach(i => out(6 + i) = ((granule >> (8 * i)) & 0xff).toByte)
    (0 until 4).foreach(i => out(14 + i) = ((serial >> (8 * i)) & 0xff).toByte)
    (0 until 4).foreach(i => out(18 + i) = ((seq >> (8 * i)) & 0xff).toByte)
    out(26) = lacing.size.toByte
    lacing.zipWithIndex.foreach { case (l, i) => out(27 + i) = l.toByte }
    System.arraycopy(body, 0, out, 27 + lacing.size, body.length)
    val crc = oggCrc(out, 0, out.length)
    (0 until 4).foreach(i => out(22 + i) = ((crc >> (8 * i)) & 0xff).toByte)
    out
  }

  /** REAL Ogg-Opus writer: BOS page carrying the 19-byte OpusHead
    * (RFC 7845 §5.1 — version 1, channel count, pre-skip, input sample
    * rate, gain 0, mapping family 0), an OpusTags comment page, then
    * `nPages - 2` deterministic data pages; the last page is EOS with
    * granule position `lastGranule` (48 kHz sample count per RFC 7845).
    */
  def encodeOggOpus(serial: Long, channels: Int, preSkip: Int,
      inputSampleRate: Long, lastGranule: Long, nPages: Int): Array[Byte] = {
    require(nPages >= 3, s"nPages $nPages: need BOS + tags + >=1 data page")
    require(channels >= 1 && channels <= 8 && preSkip >= 0, s"ch $channels preskip $preSkip")
    require(lastGranule >= preSkip, s"granule $lastGranule < preskip $preSkip")
    val head = opusHeadBytes(channels, preSkip, inputSampleRate)
    val tags = opusTagsBytes
    val nData = nPages - 2
    val pages = Seq(
      oggPage(0x02, 0L, serial, 0L, Seq(head)),
      oggPage(0x00, 0L, serial, 1L, Seq(tags))) ++
      (0 until nData).map { d =>
        val seq = 2L + d
        val last = d == nData - 1
        val granule =
          if (last) lastGranule
          else preSkip + (lastGranule - preSkip) * (d + 1) / nData
        val pkt = Array.tabulate(20 + (d * 7) % 50)(i => ((i * 31 + d * 13 + 5) & 0xff).toByte)
        oggPage(if (last) 0x04 else 0x00, granule, serial, seq, Seq(pkt))
      }
    pages.toArray.flatten
  }

  private def opusHeadBytes(channels: Int, preSkip: Int,
      inputSampleRate: Long): Array[Byte] = {
    val head = new Array[Byte](19)
    putAscii(head, 0, "OpusHead")
    head(8) = 1 // version
    head(9) = channels.toByte
    head(10) = (preSkip & 0xff).toByte; head(11) = ((preSkip >> 8) & 0xff).toByte
    (0 until 4).foreach(i => head(12 + i) = ((inputSampleRate >> (8 * i)) & 0xff).toByte)
    head
  }

  private def opusTagsBytes: Array[Byte] = {
    val vendor = "graft".getBytes("US-ASCII")
    val t = new Array[Byte](8 + 4 + vendor.length + 4)
    putAscii(t, 0, "OpusTags")
    t(8) = vendor.length.toByte
    System.arraycopy(vendor, 0, t, 12, vendor.length)
    t
  }

  /** Ogg-Opus writer whose data packets carry REAL Opus packet framing
    * ([[Opus.packetForPlan]] — valid TOC bytes, packing codes 0-3,
    * length fields, CBR/VBR code-3 framing, padding) and whose granule
    * positions are the TRUE cumulative 48 kHz sample counts of those
    * packets (RFC 7845 §4: pre-skip plus decoded samples). One packet
    * per data page, `1 + id % 4` data pages; deterministic from the id
    * alone so an oracle reproduces every count closed-form. The legacy
    * [[encodeOggOpus]] keeps its arbitrary-payload packets so every
    * existing oracle row stays byte-stable.
    */
  def encodeOggOpusReal(id: Long): Array[Byte] = {
    require(id >= 0, s"encodeOggOpusReal needs a non-negative id (got $id)")
    val channels = 1 + (id % 2).toInt
    val preSkip = (312 + id % 100).toInt
    val rate = 8000L * (1 + id % 6)
    val serial = 2000L + id
    val nData = 1 + (id % 4).toInt
    val packets = (0 until nData).map(d =>
      Opus.packetForPlan(id, d, stereo = channels == 2))
    var granule = preSkip.toLong
    val dataPages = packets.zipWithIndex.map { case (pkt, d) =>
      granule += Opus.parsePacket(pkt)
        .getOrElse(sys.error(s"plan packet invalid: id=$id d=$d"))
        .samples48k
      oggPage(if (d == nData - 1) 0x04 else 0x00, granule, serial, 2L + d,
        Seq(pkt))
    }
    (Seq(
      oggPage(0x02, 0L, serial, 0L,
        Seq(opusHeadBytes(channels, preSkip, rate))),
      oggPage(0x00, 0L, serial, 1L, Seq(opusTagsBytes))) ++ dataPages)
      .toArray.flatten
  }

  /** Extract the packet sequence from an Ogg stream: the same
    * CRC-checked single-stream page walk as [[parseOggOpus]], but
    * reassembling packets from lacing values (a 255 lace continues the
    * current packet; the 0x01 continuation flag carries a packet across
    * a page boundary). Returns None for anything the walk rejects, or
    * for a stream ending mid-packet.
    */
  def oggOpusPackets(payload: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (payload == null || payload.length < 28) return None
    def u8(i: Int): Int = payload(i) & 0xff
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3).toLong << 24)) & 0xffffffffL
    var pos = 0
    var serial = -1L
    var lastSeq = -1L
    val out = Vector.newBuilder[Array[Byte]]
    val cur = new java.io.ByteArrayOutputStream()
    var midPacket = false
    while (pos + 27 <= payload.length) {
      if (!(payload(pos) == 'O' && payload(pos + 1) == 'g' &&
        payload(pos + 2) == 'g' && payload(pos + 3) == 'S')) return None
      if (u8(pos + 4) != 0) return None
      val headerType = u8(pos + 5)
      val pageSerial = le32(pos + 14)
      val nSegs = u8(pos + 26)
      if (pos + 27 + nSegs > payload.length) return None
      val bodyLen = (0 until nSegs).map(i => u8(pos + 27 + i)).sum
      val pageLen = 27 + nSegs + bodyLen
      if (pos + pageLen > payload.length) return None
      val crcStored = le32(pos + 22)
      val zeroed = java.util.Arrays.copyOfRange(payload, pos, pos + pageLen)
      java.util.Arrays.fill(zeroed, 22, 26, 0.toByte)
      if ((oggCrc(zeroed, 0, pageLen) & 0xffffffffL) != crcStored) return None
      val pageSeq = le32(pos + 18)
      if (serial < 0) { serial = pageSerial; lastSeq = pageSeq }
      else {
        if (pageSerial != serial) return None
        if (pageSeq != lastSeq + 1) return None
        lastSeq = pageSeq
      }
      // continuation flag must agree with our mid-packet state
      if (((headerType & 0x01) != 0) != midPacket) return None
      var off = pos + 27 + nSegs
      (0 until nSegs).foreach { i =>
        val l = u8(pos + 27 + i)
        cur.write(payload, off, l)
        off += l
        if (l < 255) { out += cur.toByteArray; cur.reset(); midPacket = false }
        else midPacket = true
      }
      pos += pageLen
    }
    if (pos != payload.length || midPacket || serial < 0) None
    else Some(out.result())
  }

  /** REAL Ogg page walk: validates each page's "OggS" capture, version 0,
    * and CRC-32 (recomputed with the checksum field zeroed — a single
    * flipped payload byte fails the page), honors multi-lace packets,
    * counts pages, tracks the last non-(-1) granule position, and parses
    * channels / pre-skip / input rate out of the BOS page's OpusHead
    * packet. Returns None for anything that isn't a CRC-clean Ogg-Opus
    * stream.
    */
  def parseOggOpus(payload: Array[Byte]): Option[OggOpusMeta] = {
    if (payload == null || payload.length < 28) return None
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3).toLong << 24)) & 0xffffffffL
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    var pos = 0
    var nPages = 0
    var serial = -1L
    var lastSeq = -1L
    var lastGranule = -1L
    var channels = -1; var preSkip = -1; var rate = -1L
    while (pos + 27 <= payload.length) {
      if (!(payload(pos) == 'O' && payload(pos + 1) == 'g' &&
        payload(pos + 2) == 'g' && payload(pos + 3) == 'S')) return None
      if (u8(pos + 4) != 0) return None // stream structure version
      val headerType = u8(pos + 5)
      val granule = le64(pos + 6)
      val pageSerial = le32(pos + 14)
      val nSegs = u8(pos + 26)
      if (pos + 27 + nSegs > payload.length) return None
      var bodyLen = 0
      var firstPacketLen = 0
      var firstPacketDone = false
      (0 until nSegs).foreach { i =>
        val l = u8(pos + 27 + i)
        bodyLen += l
        if (!firstPacketDone) { firstPacketLen += l; if (l < 255) firstPacketDone = true }
      }
      val pageLen = 27 + nSegs + bodyLen
      if (pos + pageLen > payload.length) return None
      val crcStored = le32(pos + 22)
      val zeroed = java.util.Arrays.copyOfRange(payload, pos, pos + pageLen)
      java.util.Arrays.fill(zeroed, 22, 26, 0.toByte)
      if ((oggCrc(zeroed, 0, pageLen) & 0xffffffffL) != crcStored) return None
      val pageSeq = le32(pos + 18)
      if (serial < 0) { serial = pageSerial; lastSeq = pageSeq }
      else {
        // one logical stream only: a concatenated/multiplexed capture
        // (second serial) or a non-consecutive sequence number would
        // otherwise mix another stream's pages into this one's counts
        if (pageSerial != serial) return None
        if (pageSeq != lastSeq + 1) return None
        lastSeq = pageSeq
      }
      if (granule != -1L) lastGranule = granule
      if ((headerType & 0x02) != 0 && firstPacketLen >= 19) {
        val b = pos + 27 + nSegs
        if (new String(payload, b, 8, "US-ASCII") == "OpusHead") {
          channels = u8(b + 9)
          preSkip = le16(b + 10)
          rate = le32(b + 12)
        }
      }
      nPages += 1
      pos += pageLen
    }
    if (pos != payload.length || nPages == 0 || channels < 0 || lastGranule < 0) None
    else Some(OggOpusMeta(serial, nPages, channels, preSkip, rate, lastGranule))
  }

  // ------------------------------------------------------------------
  // Driver-verifiable synthetic stats (the oracle face)
  // ------------------------------------------------------------------

  /** Exact container metadata from PARSED synthetic payloads — the
    * container twin of `Multimodal.syntheticBmpStats` /
    * `Audio.syntheticWavStats`: even ids synthesize an MP4 (ids divisible
    * by 4 use version-1 64-bit durations past 2^32 ticks — the path a
    * 32-bit-only parser gets wrong), odd ids an Ogg-Opus stream; each
    * round-trips through the real encoder → parser, and every emitted
    * value comes from the PARSED bytes. All closed-form integer
    * arithmetic — an oracle reproduces the numbers from the id alone, so
    * a hash match proves the box walk / page walk inverts both layouts
    * (offsets, endianness, fixed-point splits, version variants, CRC).
    */
  /** Malformed-input audit — the reject face of
    * [[syntheticContainerStats]]: each id's payload is deterministically
    * either left intact or corrupted by one of three realistic damage
    * classes, then pushed through the REAL parser; the row records
    * whether the walk accepted it (and the parsed part count when it
    * did). mode = (id / 2) % 4:
    *
    *   0 — intact (must accept; n_parts from the parse)
    *   1 — magic clobber: 'ftyp' / 'OggS' capture byte overwritten
    *   2 — mid-structure tail truncation (5 bytes): the last box /
    *       page claims more bytes than remain
    *   3 — MP4: moov size32 inflated past EOF (crafted size overrun);
    *       Ogg: one body byte XOR-flipped (the page CRC must catch it)
    *
    * All three damage classes MUST reject — the oracle pins
    * accepted = (mode = 0) closed-form, so a parser that believes a
    * clobbered magic, walks past EOF, or skips the CRC hash-mismatches.
    * Honest boundary: ISO BMFF has no payload checksum, so an mdat
    * byte flip is undetectable by design (ContainerSpec documents it);
    * the flip class therefore targets Ogg, whose CRC detects every
    * single-byte error, and MP4 gets the size-overrun class instead.
    */
  def rejectCorpusStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("container", StringType),
      StructField("mode", LongType),
      StructField("accepted", BooleanType),
      StructField("n_parts", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0, s"rejectCorpusStats needs a non-negative id (got $id)")
        val mode = (id / 2) % 4
        val isMp4 = id % 2 == 0
        val bytes = encodeForId(id)
        val corrupted = corrupt(bytes, mode, isMp4)
        val parsed: Option[Long] =
          if (isMp4) parseMp4(corrupted).map(_.nTopBoxes.toLong)
          else parseOggOpus(corrupted).map(_.nPages.toLong)
        Row(id, if (isMp4) "mp4" else "ogg", mode, parsed.isDefined,
          parsed.map(Long.box).orNull)
      }
    }(enc)
  }

  /** Per-stream Opus packet-layer stats over the REAL-framing corpus
    * ([[encodeOggOpusReal]]): each id's stream is encoded, CRC-walked,
    * its packets reassembled and parsed under the RFC 6716 R1-R7 rules
    * ([[Opus.parsePacket]]), and the row aggregates what the PARSER
    * recovered — packet/frame counts, true 48 kHz sample total, VBR and
    * padded packet counts, and the SILK/Hybrid/CELT mode split. All
    * derivations are closed-form in the id, so a hash match against the
    * arithmetic oracle proves the writer emits valid framing AND the
    * parser inverts every packing code, length coding, and padding
    * form. `accepted` pins the walk + every packet parse succeeding AND
    * the granule range equalling the packet-layer sample total.
    */
  def opusTocStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("n_packets", LongType),
      StructField("n_frames", LongType),
      StructField("samples48", LongType),
      StructField("n_vbr", LongType),
      StructField("n_padded", LongType),
      StructField("n_silk", LongType),
      StructField("n_hybrid", LongType),
      StructField("n_celt", LongType),
      StructField("accepted", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0, s"opusTocStats needs a non-negative id (got $id)")
        val bytes = encodeOggOpusReal(id)
        val parsed = for {
          meta <- parseOggOpus(bytes)
          pkts <- oggOpusPackets(bytes)
          infos <- {
            val data = pkts.drop(2).map(Opus.parsePacket)
            if (data.forall(_.isDefined)) Some(data.flatten) else None
          }
          // the packet layer must account for the granule range exactly
          if meta.lastGranule - meta.preSkip == infos.map(_.samples48k).sum
        } yield infos
        parsed match {
          case Some(infos) =>
            Row(id, infos.size.toLong,
              infos.map(_.frames.toLong).sum,
              infos.map(_.samples48k).sum,
              infos.count(_.vbr).toLong,
              infos.count(_.padded).toLong,
              infos.count(i => Opus.mode(i.config) == 0).toLong,
              infos.count(i => Opus.mode(i.config) == 1).toLong,
              infos.count(i => Opus.mode(i.config) == 2).toLong,
              true)
          case None =>
            Row(id, null, null, null, null, null, null, null, null, false)
        }
      }
    }(enc)
  }

  /** The deterministic per-id payload both container stats share (the
    * same parameter derivations as [[syntheticContainerStats]]).
    */
  def encodeForId(id: Long): Array[Byte] =
    if (id % 2 == 0) {
      val version = if (id % 4 == 0) 1 else 0
      val timescale = 600L * (1 + id % 5)
      val duration = if (version == 1) (1L << 32) + 977L * id else 10000L + 977L * id
      encodeMp4("isom", timescale, duration,
        (16 * (4 + id % 9)).toInt, (16 * (3 + id % 5)).toInt, version)
    } else {
      val preSkip = (312 + id % 100).toInt
      encodeOggOpus(1000L + id, if (id % 4 == 1) 1 else 2, preSkip,
        8000L * (1 + id % 6), preSkip + 960L * (50 + id % 300), (3 + id % 4).toInt)
    }

  /** Apply one damage class (see [[rejectCorpusStats]]); mode 0 returns
    * the payload untouched.
    */
  def corrupt(bytes: Array[Byte], mode: Long, isMp4: Boolean): Array[Byte] =
    mode match {
      case 0 => bytes
      case 1 =>
        val b = bytes.clone()
        b(if (isMp4) 4 else 0) = 'X'.toByte
        b
      case 2 => java.util.Arrays.copyOf(bytes, bytes.length - 5)
      case 3 =>
        val b = bytes.clone()
        if (isMp4) {
          // ftyp is 16 bytes, so moov's size32 sits at offset 16: inflate
          // it 1000 bytes past what remains — the walk must refuse
          val size = ((b(16) & 0xffL) << 24) | ((b(17) & 0xffL) << 16) |
            ((b(18) & 0xffL) << 8) | (b(19) & 0xffL)
          putBe32(b, 16, size + 1000)
        } else b(b.length / 2) = (b(b.length / 2) ^ 0x5a).toByte
        b
      case m => throw new IllegalArgumentException(s"corrupt mode $m")
    }

  def syntheticContainerStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("container", StringType),
      StructField("brand", StringType)) ++
      Seq("timescale", "duration_units", "duration_ms", "width", "height",
        "channels", "preskip", "sample_rate", "n_parts").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0, s"syntheticContainerStats needs a non-negative id (got $id)")
        if (id % 2 == 0) {
          val m = parseMp4(encodeForId(id))
            .getOrElse(throw new IllegalStateException(s"mp4 round-trip failed for id $id"))
          Row(id, "mp4", m.brand, m.timescale, m.duration,
            m.duration * 1000 / m.timescale, m.width.toLong, m.height.toLong,
            null, null, null, m.nTopBoxes.toLong)
        } else {
          val m = parseOggOpus(encodeForId(id))
            .getOrElse(throw new IllegalStateException(s"ogg round-trip failed for id $id"))
          val units = m.lastGranule - m.preSkip
          Row(id, "ogg", null, 48000L, units, units * 1000 / 48000,
            null, null, m.channels.toLong, m.preSkip.toLong,
            m.inputSampleRate, m.nPages.toLong)
        }
      }
    }(enc)
  }
}
