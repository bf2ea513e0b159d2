package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MP4 box walk + Ogg-Opus page walk: exact round trips across version
  * variants, CRC enforcement, and never-throw robustness on garbage.
  */
class ContainerSpec extends AnyFunSuite {

  test("mp4 version-0 round trip (brand, timescale, duration, dims, handler)") {
    val m = Container.parseMp4(
      Container.encodeMp4("isom", 600, 123456, 640, 480, version = 0)).get
    assert(m.brand === "isom" && m.timescale === 600L && m.duration === 123456L)
    assert(m.width === 640 && m.height === 480 && m.handler === "vide")
    assert(m.nTopBoxes === 4) // ftyp, moov, free, mdat
  }

  test("mp4 version-1 carries 64-bit durations past 2^32 exactly") {
    val big = (1L << 32) + 98765L
    val m = Container.parseMp4(
      Container.encodeMp4("mp42", 90000, big, 1920, 1080, version = 1)).get
    assert(m.duration === big && m.timescale === 90000L)
    assert(m.width === 1920 && m.height === 1080)
  }

  test("mp4 honors size==0 (to-EOF) and size==1 (largesize) top-level boxes") {
    val base = Container.encodeMp4("isom", 600, 1000, 64, 48)
    // rewrite the trailing mdat's 32-bit size to 0 (extends to EOF)
    val mdatPos = base.length - 24
    assert(new String(base, mdatPos + 4, 4, "US-ASCII") === "mdat")
    val toEof = base.clone
    (0 until 4).foreach(i => toEof(mdatPos + i) = 0)
    assert(Container.parseMp4(toEof).get.duration === 1000L)
    // replace mdat with a largesize box: size32=1, fourcc, u64 size
    val payload = java.util.Arrays.copyOfRange(base, mdatPos + 8, base.length)
    val wide = new Array[Byte](16 + payload.length)
    wide(3) = 1 // size32 == 1 → largesize follows
    "mdat".getBytes("US-ASCII").copyToArray(wide, 4)
    val total = wide.length.toLong
    (0 until 8).foreach(i => wide(8 + i) = ((total >> (8 * (7 - i))) & 0xff).toByte)
    payload.copyToArray(wide, 16)
    assert(Container.parseMp4(base.take(mdatPos) ++ wide).get.duration === 1000L)
  }

  test("mp4 rejects truncation and box-size overruns without throwing") {
    val good = Container.encodeMp4("isom", 600, 1000, 64, 48)
    assert(Container.parseMp4(null).isEmpty)
    assert(Container.parseMp4(good.take(40)).isEmpty)        // truncated moov
    assert(Container.parseMp4("notanmp4".getBytes ++ good).isEmpty)
    val overrun = good.clone
    overrun(16) = 0x7f // moov size32 → huge, overruns the file
    assert(Container.parseMp4(overrun).isEmpty)
    // largesize with the top bit set (negative as i64) must not be believed
    val crafted = good.clone
    (0 until 4).foreach(i => crafted(16 + i) = if (i == 3) 1 else 0)
    assert(Container.parseMp4(crafted).isEmpty) // size==1 but no largesize room
  }

  test("ogg-opus round trip (serial, pages, channels, preskip, rate, granule)") {
    val m = Container.parseOggOpus(
      Container.encodeOggOpus(77, 2, 312, 48000, 312 + 960 * 100, 5)).get
    assert(m.serial === 77L && m.nPages === 5)
    assert(m.channels === 2 && m.preSkip === 312 && m.inputSampleRate === 48000L)
    assert(m.lastGranule === 312L + 960 * 100)
  }

  test("ogg rejects a single flipped byte (CRC) without throwing") {
    val good = Container.encodeOggOpus(5, 1, 100, 16000, 100 + 960, 3)
    val rnd = new scala.util.Random(3)
    (1 to 50).foreach { _ =>
      val bad = good.clone
      val i = rnd.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 + rnd.nextInt(255))).toByte
      assert(Container.parseOggOpus(bad).isEmpty, s"flip at $i must fail the page CRC")
    }
  }

  test("ogg rejects truncation and trailing garbage") {
    val good = Container.encodeOggOpus(5, 1, 100, 16000, 100 + 960, 4)
    assert(Container.parseOggOpus(null).isEmpty)
    assert(Container.parseOggOpus(good.take(good.length - 3)).isEmpty)
    assert(Container.parseOggOpus(good ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("seeded fuzz: 200 random parameter draws round-trip exactly") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { i =>
      if (i % 2 == 0) {
        val version = rnd.nextInt(2)
        val ts = 1L + rnd.nextInt(1000000)
        val dur =
          if (version == 1) rnd.nextLong(1L << 40) else rnd.nextLong(1L << 32)
        val w = rnd.nextInt(8192); val h = rnd.nextInt(8192)
        val m = Container.parseMp4(Container.encodeMp4("isom", ts, dur, w, h, version))
          .getOrElse(fail(s"iteration $i: mp4 decode failed"))
        assert(m.timescale === ts && m.duration === dur && m.width === w && m.height === h,
          s"iteration $i")
      } else {
        val ch = 1 + rnd.nextInt(8)
        val pre = rnd.nextInt(4000)
        val granule = pre + rnd.nextLong(1L << 40)
        val pages = 3 + rnd.nextInt(20)
        val serial = rnd.nextLong(1L << 32)
        val m = Container.parseOggOpus(
          Container.encodeOggOpus(serial, ch, pre, 48000, granule, pages))
          .getOrElse(fail(s"iteration $i: ogg decode failed"))
        assert(m.serial === serial && m.nPages === pages && m.channels === ch &&
          m.preSkip === pre && m.lastGranule === granule, s"iteration $i")
      }
    }
  }

  test("seeded fuzz: random byte garbage and corrupted files never throw") {
    val rnd = new scala.util.Random(7)
    val mp4 = Container.encodeMp4("isom", 600, 1000, 64, 48)
    val ogg = Container.encodeOggOpus(5, 2, 300, 48000, 300 + 9600, 4)
    (1 to 500).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      Container.parseMp4(bytes); Container.parseOggOpus(bytes)
      val m = mp4.clone; m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Container.parseMp4(m)
      val o = ogg.clone; o(rnd.nextInt(o.length)) = rnd.nextInt(256).toByte
      Container.parseOggOpus(o)
    }
  }

  test("reject corpus: every damage class rejects, intact accepts (ids 0..79)") {
    (0L until 80L).foreach { id =>
      val mode = (id / 2) % 4
      val isMp4 = id % 2 == 0
      val damaged = Container.corrupt(Container.encodeForId(id), mode, isMp4)
      val accepted =
        if (isMp4) Container.parseMp4(damaged).isDefined
        else Container.parseOggOpus(damaged).isDefined
      assert(accepted === (mode == 0L), s"id=$id mode=$mode mp4=$isMp4")
    }
  }

  test("honest boundary: an mdat payload flip is UNDETECTABLE in BMFF (no checksum)") {
    // ISO BMFF carries no payload CRC — flipping a byte inside mdat's
    // body leaves every parsed field intact and the file accepted. This
    // is why the reject corpus gives MP4 the size-overrun class and Ogg
    // (whose CRC-32 detects every single-byte error) the flip class.
    val bytes = Container.encodeMp4("isom", 600, 1000, 64, 48)
    val flipped = bytes.clone()
    flipped(bytes.length - 1) = (flipped(bytes.length - 1) ^ 0x5a).toByte
    assert(Container.parseMp4(flipped) === Container.parseMp4(bytes))
  }
}

/** The Spark face: synthetic stats shape + partitioning invariance. */
class ContainerStatsSpec extends graft.SparkSpec {

  test("syntheticContainerStats alternates mp4/ogg and is partitioning-invariant") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val a = Container.syntheticContainerStats(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val b = Container.syntheticContainerStats(ids.repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a === b)
    assert(a(0L)(1) === "mp4" && a(1L)(1) === "ogg")
    // id 0: version-1 duration past 2^32
    assert(a(0L)(4) === (1L << 32))
    // id 1: ogg duration_ms = 960*51*1000/48000 = 1020
    assert(a(1L)(5) === 960L * 51 * 1000 / 48000)
  }

  test("describePayload sniffs mp4 and ogg media types with NULL dims") {
    import spark.implicits._
    val rows = Seq(
      (1L, Container.encodeMp4("isom", 600, 1000, 64, 48)),
      (2L, Container.encodeOggOpus(5, 1, 100, 16000, 100 + 960, 3)),
      (3L, "plain text".getBytes("UTF-8")))
    val got = Multimodal.describePayload(rows.toDF("doc_id", "payload"))
      .select($"doc_id", $"media_meta.media_type", $"media_meta.width").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(got(1L) === ("video/mp4", None))
    assert(got(2L) === ("application/ogg", None))
    assert(got(3L)._1 === "application/octet-stream")
  }
}
