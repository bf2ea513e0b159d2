package graft.multimodal

/** Opus packet layer (RFC 6716 §3): TOC byte, frame packing codes 0-3,
  * the 1-/2-byte frame length coding, code-3 CBR/VBR framing and
  * padding — parsed and validated against the specification's R1-R7
  * packet rules, plus the inverse (a writer emitting real framing for
  * the synthetic corpus, [[Container.opusPacketForPage]]).
  *
  * Scope: this is the packet STRUCTURE layer — everything above the
  * SILK/CELT bitstreams. Frame payload decode (range-coded SILK/CELT →
  * PCM) stays a documented waiver: no conformance vectors or second
  * decoder exist in this environment, so a from-scratch transform
  * decoder could not be validated (the JPEG codec was only accepted
  * because it cross-decodes pixel-exact against an independent
  * decoder). Packet structure, however, is exactly checkable: writer
  * and parser are inverse by construction and every R-rule violation
  * is a crafted-fixture test (OpusSpec).
  *
  * Reference behavior anchor: the reference app stores tweet media as
  * opaque URLs (`app.py` renders them; nothing decodes) — the
  * multimodal surface here is the training-pipeline extension the
  * brief asks for.
  */
object Opus {

  /** One parsed packet: configuration row of the TOC table, channel
    * flag, packing code, frame count, per-frame duration in TENTHS of
    * a millisecond (2.5 ms is the odd one out), flags, and the summed
    * compressed frame bytes (length fields and padding excluded).
    * `vbr` reports whether frames within the packet may differ in
    * length (codes 2 and VBR code 3).
    */
  final case class PacketInfo(
      config: Int, stereo: Boolean, code: Int, frames: Int,
      frameTenthsMs: Int, vbr: Boolean, padded: Boolean, frameBytes: Int) {
    /** Packet duration in 48 kHz samples (the Ogg granule unit). */
    def samples48k: Long = frames.toLong * frameTenthsMs * 48L / 10L
  }

  /** RFC 6716 §3.1 TOC frame sizes, tenths of a millisecond:
    * SILK (configs 0-11) 10/20/40/60, Hybrid (12-15) 10/20,
    * CELT (16-31) 2.5/5/10/20.
    */
  def frameTenthsMs(config: Int): Int =
    if (config < 12) Array(100, 200, 400, 600)(config % 4)
    else if (config < 16) Array(100, 200)(config % 2)
    else Array(25, 50, 100, 200)(config % 4)

  /** Mode of a configuration: 0 = SILK-only, 1 = Hybrid, 2 = CELT-only. */
  def mode(config: Int): Int =
    if (config < 12) 0 else if (config < 16) 1 else 2

  private val MaxFrameBytes = 1275 // R2
  private val MaxTenthsMs = 1200 // R5: at most 120 ms of audio per packet

  /** Parse and validate one Opus packet per RFC 6716 §3.2-§3.4
    * (requirements R1-R7). Returns None on ANY malformed packet:
    * empty input (R1), a frame longer than 1275 bytes (R2), a code-1
    * packet with an odd payload (R3), a truncated code-2 length field
    * (R4), a code-3 frame count of zero or packet duration over 120 ms
    * (R5), a code-3 CBR payload not divisible by its frame count (R6),
    * or truncated code-3 lengths/padding (R7). Never throws.
    */
  def parsePacket(p: Array[Byte]): Option[PacketInfo] = {
    if (p == null || p.length < 1) return None // R1
    val toc = p(0) & 0xff
    val config = toc >> 3
    val stereo = (toc & 0x4) != 0
    val code = toc & 0x3
    val dur = frameTenthsMs(config)
    val n = p.length
    // 1-/2-byte frame length at offset o → (length, next offset);
    // None when truncated
    def len(o: Int): Option[(Int, Int)] =
      if (o >= n) None
      else {
        val b1 = p(o) & 0xff
        if (b1 < 252) Some((b1, o + 1))
        else if (o + 1 >= n) None
        else Some((b1 + 4 * (p(o + 1) & 0xff), o + 2))
      }
    def ok(i: PacketInfo): Option[PacketInfo] =
      if (i.frames.toLong * dur <= MaxTenthsMs) Some(i) else None // R5
    code match {
      case 0 =>
        val fb = n - 1
        if (fb > MaxFrameBytes) None // R2
        else ok(PacketInfo(config, stereo, 0, 1, dur, vbr = false,
          padded = false, fb))
      case 1 =>
        val fb = n - 1
        if (fb % 2 != 0 || fb / 2 > MaxFrameBytes) None // R3 / R2
        else ok(PacketInfo(config, stereo, 1, 2, dur, vbr = false,
          padded = false, fb))
      case 2 =>
        len(1) match {
          case Some((l1, o)) if l1 <= MaxFrameBytes && n - o >= l1 &&
              n - o - l1 <= MaxFrameBytes =>
            ok(PacketInfo(config, stereo, 2, 2, dur, vbr = true,
              padded = false, n - o))
          case _ => None // R4 / R2
        }
      case _ => // code 3
        if (n < 2) return None // R4
        val fc = p(1) & 0xff
        val vbr = (fc & 0x80) != 0
        val pad = (fc & 0x40) != 0
        val m = fc & 0x3f
        if (m < 1 || m.toLong * dur > MaxTenthsMs) return None // R5
        var o = 2
        var padBytes = 0
        if (pad) {
          // padding length: each 255 byte adds 254 more and continues
          var more = true
          while (more) {
            if (o >= n) return None // R7
            val b = p(o) & 0xff; o += 1
            if (b == 255) padBytes += 254 else { padBytes += b; more = false }
          }
        }
        if (vbr) {
          var sum = 0
          var i = 0
          while (i < m - 1) {
            len(o) match {
              case Some((l, o2)) if l <= MaxFrameBytes => sum += l; o = o2
              case _ => return None // R7 / R2
            }
            i += 1
          }
          val lastLen = n - o - padBytes - sum
          if (lastLen < 0 || lastLen > MaxFrameBytes) None // R7 / R2
          else ok(PacketInfo(config, stereo, 3, m, dur, vbr = true,
            padded = pad, sum + lastLen))
        } else {
          val avail = n - o - padBytes
          if (avail < 0 || avail % m != 0 || avail / m > MaxFrameBytes)
            None // R7 / R6 / R2
          else ok(PacketInfo(config, stereo, 3, m, dur, vbr = false,
            padded = pad, avail))
        }
    }
  }

  /** Deterministic REAL packet for data page `d` of synthetic stream
    * `id` — the writer half of the packet layer. Cycles the packing
    * code with the page index, walks every TOC configuration across the
    * corpus (`config = (id*7 + d*3) % 32`), exercises the 2-byte length
    * coding (`id % 5 == 0` code-2 packets carry a 252+ first frame),
    * code-3 CBR/VBR alternation, and explicit padding. Every derivation
    * is closed-form in `(id, d)` so the [[graft.queries]] oracle can
    * reproduce the parse results arithmetically.
    */
  def packetForPlan(id: Long, d: Int, stereo: Boolean): Array[Byte] = {
    require(id >= 0 && d >= 0, s"packetForPlan(id=$id, d=$d)")
    val cfg = ((id * 7 + d * 3) % 32).toInt
    val dur = frameTenthsMs(cfg)
    val code = d % 4
    val toc = ((cfg << 3) | (if (stereo) 4 else 0) | code).toByte
    def fill(len: Int): Array[Byte] =
      Array.tabulate(len)(i => ((i * 31 + d * 13 + id).toInt & 0xff).toByte)
    code match {
      case 0 => toc +: fill(10 + (d * 3) % 20)
      case 1 => toc +: fill(2 * (8 + d % 10))
      case 2 =>
        val l1 = if (id % 5 == 0) (252 + id % 24).toInt else 5 + d % 7
        val l2 = 4 + d % 5
        val lenField =
          if (l1 < 252) Array(l1.toByte)
          else Array((252 + (l1 - 252) % 4).toByte, ((l1 - 252) / 4).toByte)
        (toc +: lenField) ++ fill(l1 + l2)
      case _ =>
        val mmax = math.min(48, MaxTenthsMs / dur)
        val m = 1 + ((d + id) % mmax).toInt
        val vbr = (id + d) % 2 == 1
        val pad = id % 3 == 0
        val padBytes = (3 + id % 4).toInt
        val fc = ((if (vbr) 0x80 else 0) | (if (pad) 0x40 else 0) | m).toByte
        val head = Array(toc, fc) ++
          (if (pad) Array(padBytes.toByte) else Array.emptyByteArray)
        val body =
          if (vbr) {
            val lens = Array.tabulate(m)(i => 4 + ((i + id) % 6).toInt)
            lens.dropRight(1).map(_.toByte) ++ fill(lens.sum)
          } else fill(m * (6 + (id % 5).toInt))
        head ++ body ++
          (if (pad) new Array[Byte](padBytes) else Array.emptyByteArray)
    }
  }
}
