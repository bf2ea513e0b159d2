package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Packet-layer fixtures for [[Opus]]: the RFC 6716 §3 TOC table, the
  * writer/parser inverse over the deterministic plan grid, and one
  * crafted fixture per R1-R7 validity rule.
  */
class OpusSpec extends AnyFunSuite {

  test("TOC frame sizes match RFC 6716 §3.1") {
    // SILK 10/20/40/60 ms, Hybrid 10/20 ms, CELT 2.5/5/10/20 ms
    assert(Opus.frameTenthsMs(0) === 100 && Opus.frameTenthsMs(3) === 600)
    assert(Opus.frameTenthsMs(8) === 100 && Opus.frameTenthsMs(11) === 600)
    assert(Opus.frameTenthsMs(12) === 100 && Opus.frameTenthsMs(13) === 200)
    assert(Opus.frameTenthsMs(14) === 100 && Opus.frameTenthsMs(15) === 200)
    assert(Opus.frameTenthsMs(16) === 25 && Opus.frameTenthsMs(17) === 50)
    assert(Opus.frameTenthsMs(19) === 200 && Opus.frameTenthsMs(28) === 25)
    assert(Opus.frameTenthsMs(31) === 200)
    assert(Opus.mode(0) === 0 && Opus.mode(11) === 0)
    assert(Opus.mode(12) === 1 && Opus.mode(15) === 1)
    assert(Opus.mode(16) === 2 && Opus.mode(31) === 2)
  }

  test("the plan writer and the parser are exact inverses over the grid") {
    for (id <- 0L until 60L; d <- 0 to (id % 4).toInt) {
      val stereo = id % 2 == 1
      val p = Opus.packetForPlan(id, d, stereo)
      val info = Opus.parsePacket(p)
        .getOrElse(fail(s"plan packet rejected: id=$id d=$d"))
      val cfg = ((id * 7 + d * 3) % 32).toInt
      val dur = Opus.frameTenthsMs(cfg)
      assert(info.config === cfg && info.stereo === stereo &&
        info.code === d % 4 && info.frameTenthsMs === dur, s"id=$id d=$d")
      val expFrames = (d % 4) match {
        case 0 => 1
        case 1 => 2
        case 2 => 2
        case _ => 1 + ((d + id) % math.min(48, 1200 / dur)).toInt
      }
      assert(info.frames === expFrames, s"id=$id d=$d")
      val expBytes = (d % 4) match {
        case 0 => 10 + (d * 3) % 20
        case 1 => 2 * (8 + d % 10)
        case 2 =>
          (if (id % 5 == 0) (252 + id % 24).toInt else 5 + d % 7) + 4 + d % 5
        case _ =>
          if ((id + d) % 2 == 1)
            (0 until expFrames).map(i => 4 + ((i + id) % 6).toInt).sum
          else expFrames * (6 + (id % 5).toInt)
      }
      assert(info.frameBytes === expBytes, s"id=$id d=$d")
      assert(info.vbr === (d % 4 == 2 || (d % 4 == 3 && (id + d) % 2 == 1)))
      assert(info.padded === (d % 4 == 3 && id % 3 == 0))
    }
  }

  private def toc(cfg: Int, code: Int, stereo: Boolean = false): Byte =
    ((cfg << 3) | (if (stereo) 4 else 0) | code).toByte

  test("R1: the empty packet is invalid") {
    assert(Opus.parsePacket(Array.emptyByteArray).isEmpty)
    assert(Opus.parsePacket(null).isEmpty)
  }

  test("R2: a frame longer than 1275 bytes is invalid, 1275 exactly is fine") {
    val over = toc(8, 0) +: new Array[Byte](1276)
    assert(Opus.parsePacket(over).isEmpty)
    val max = toc(8, 0) +: new Array[Byte](1275)
    assert(Opus.parsePacket(max).exists(_.frameBytes === 1275))
    // code 1: each half over the cap
    assert(Opus.parsePacket(toc(8, 1) +: new Array[Byte](2552)).isEmpty)
  }

  test("R3: a code-1 packet with an odd payload is invalid") {
    assert(Opus.parsePacket(toc(8, 1) +: new Array[Byte](7)).isEmpty)
    assert(Opus.parsePacket(toc(8, 1) +: new Array[Byte](8))
      .exists(i => i.frames === 2 && i.frameBytes === 8))
  }

  test("R4: truncated or oversized code-2 length fields are invalid") {
    assert(Opus.parsePacket(Array(toc(8, 2))).isEmpty) // no length at all
    assert(Opus.parsePacket(Array(toc(8, 2), 252.toByte)).isEmpty) // 2-byte len cut
    // first frame claims more than the packet holds
    assert(Opus.parsePacket(Array(toc(8, 2), 30.toByte) ++
      new Array[Byte](20)).isEmpty)
    // exact fit parses; the 2-byte coding decodes b1 + 4*b2
    val twoByte = Array(toc(8, 2), 253.toByte, 2.toByte) ++ new Array[Byte](265)
    assert(Opus.parsePacket(twoByte)
      .exists(i => i.frames === 2 && i.frameBytes === 265))
  }

  test("R5: code-3 zero frames or over 120 ms of audio is invalid") {
    // m = 0
    assert(Opus.parsePacket(Array(toc(19, 3), 0x00.toByte)).isEmpty)
    // CELT 20 ms × 7 frames = 140 ms
    assert(Opus.parsePacket(Array(toc(19, 3), 7.toByte) ++
      new Array[Byte](14)).isEmpty)
    // 20 ms × 6 = 120 ms exactly is legal (CBR, 2 bytes each)
    assert(Opus.parsePacket(Array(toc(19, 3), 6.toByte) ++
      new Array[Byte](12)).exists(_.frames === 6))
    // a 60 ms SILK config caps at 2 frames
    assert(Opus.parsePacket(Array(toc(3, 3), 3.toByte) ++
      new Array[Byte](9)).isEmpty)
  }

  test("R6: a code-3 CBR payload not divisible by the frame count is invalid") {
    assert(Opus.parsePacket(Array(toc(17, 3), 2.toByte) ++
      new Array[Byte](7)).isEmpty)
    assert(Opus.parsePacket(Array(toc(17, 3), 2.toByte) ++
      new Array[Byte](8)).exists(i => i.frames === 2 && i.frameBytes === 8))
  }

  test("R7: truncated code-3 VBR lengths and padding are invalid") {
    // VBR, m = 3, but only one length field then nothing
    assert(Opus.parsePacket(Array(toc(17, 3), (0x80 | 3).toByte,
      5.toByte)).isEmpty)
    // VBR lengths that overrun the packet
    assert(Opus.parsePacket(Array(toc(17, 3), (0x80 | 2).toByte,
      50.toByte) ++ new Array[Byte](10)).isEmpty)
    // padding flag with no padding length byte
    assert(Opus.parsePacket(Array(toc(17, 3), (0x40 | 1).toByte)).isEmpty)
    // padding larger than the remaining bytes
    assert(Opus.parsePacket(Array(toc(17, 3), (0x40 | 1).toByte,
      200.toByte) ++ new Array[Byte](10)).isEmpty)
    // the 255-chain: 255 then 4 → 258 padding bytes, parses when present
    val chained = Array(toc(17, 3), (0x40 | 1).toByte, 255.toByte,
      4.toByte) ++ new Array[Byte](258 + 6)
    assert(Opus.parsePacket(chained)
      .exists(i => i.padded && i.frames === 1 && i.frameBytes === 6))
  }

  test("VBR code-3 with explicit lengths parses; DTX zero-length frames are legal") {
    // m = 3, lengths 4 and 0 (DTX), last implicit = 5
    val p = Array(toc(17, 3), (0x80 | 3).toByte, 4.toByte, 0.toByte) ++
      new Array[Byte](9)
    assert(Opus.parsePacket(p)
      .exists(i => i.frames === 3 && i.vbr && i.frameBytes === 9))
  }

  test("the real-framing Ogg streams roundtrip: CRC walk, lacing, granule accounting") {
    for (id <- Seq(0L, 1L, 3L, 7L, 15L, 20L, 34L, 55L, 119L)) {
      val bytes = Container.encodeOggOpusReal(id)
      val meta = Container.parseOggOpus(bytes)
        .getOrElse(fail(s"stream rejected: id=$id"))
      assert(meta.channels === 1 + (id % 2).toInt)
      assert(meta.preSkip === (312 + id % 100).toInt)
      val pkts = Container.oggOpusPackets(bytes)
        .getOrElse(fail(s"packet walk rejected: id=$id"))
      val nData = 1 + (id % 4).toInt
      assert(pkts.size === nData + 2, s"id=$id")
      assert(new String(pkts(0), 0, 8, "US-ASCII") === "OpusHead")
      assert(new String(pkts(1), 0, 8, "US-ASCII") === "OpusTags")
      val infos = pkts.drop(2).map(p => Opus.parsePacket(p)
        .getOrElse(fail(s"data packet rejected: id=$id")))
      // the granule range is exactly the packet-layer sample total
      assert(meta.lastGranule - meta.preSkip ===
        infos.map(_.samples48k).sum, s"id=$id")
    }
    // id=15: code-2 page with a 267-byte first frame → a 255 lacing
    // continuation inside the page; the reassembled packet parses
    val pkts15 = Container.oggOpusPackets(Container.encodeOggOpusReal(15L)).get
    val big = pkts15.drop(2).map(Opus.parsePacket(_).get)
      .find(_.code === 2).getOrElse(fail("no code-2 packet in id=15"))
    assert(big.frameBytes === 267 + 6)
  }

  test("parsePacket and oggOpusPackets never throw on arbitrary bytes") {
    var seed = 0x2545F4914F6CDD1DL
    def next(): Long = { seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17; seed }
    (0 until 2000).foreach { i =>
      val len = (next() & 0x3f).toInt
      val arr = Array.tabulate(len)(_ => (next() & 0xff).toByte)
      Opus.parsePacket(arr) // must not throw
      Container.oggOpusPackets(arr) // must not throw
    }
    // and corrupted real streams reject cleanly (CRC or structure)
    val base = Container.encodeOggOpusReal(7L)
    (0 until base.length by 17).foreach { i =>
      val b = base.clone(); b(i) = (b(i) ^ 0x40).toByte
      Container.oggOpusPackets(b) // must not throw; almost surely None
    }
  }
}
