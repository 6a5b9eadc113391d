package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Header-only audio metadata from a binary column — sample rate,
  * channels, and duration WITHOUT decoding samples, for every audio
  * family a mixed corpus actually carries. This is what turns
  * [[MediaRouter]]'s audio format tags into the accounting a curation
  * pipeline needs (hours-of-audio per source/language/quality stratum)
  * at header-read cost; the full-decode path
  * ([[Multimodal.decodeAudioFeatures]]) stays for signal statistics
  * on the PCM formats the JDK can decode.
  *
  * Durations are EXACT where the container records sample counts
  * (`exact = true`: FLAC STREAMINFO, Ogg terminal-page granule
  * position, BMFF mvhd, WAV/AU data-size arithmetic, AIFF COMM) and a
  * documented CBR ESTIMATE for bare MPEG audio (`exact = false`:
  * stream bytes × 8 / first-frame bitrate — right for constant-rate
  * files, approximate for VBR without a Xing header).
  *
  * Scale shape: one narrow per-row map reading leading bytes (plus,
  * for Ogg, one bounded backward scan for the terminal page header) —
  * no shuffle, no sample buffers. Malformed blobs quarantine as null.
  */
object AudioContainer {

  /** `exact` = duration derived from recorded sample counts, not a
    * bitrate estimate.
    */
  final case class Meta(format: String, sampleRate: Int, channels: Int,
      durationMs: Long, exact: Boolean)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u64le(b: Array[Byte], i: Int): Long =
    u32le(b, i) | (u32le(b, i + 4) << 32)
  private def cc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** WAV: fmt chunk (channels, rate, byte rate) + data chunk size →
    * exact duration (RIFF walk; chunks are word-aligned).
    */
  private def wav(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44 || cc(b, 0) != "RIFF" || cc(b, 8) != "WAVE") return None
    var i = 12L
    var rate = 0L
    var ch = 0
    var byteRate = 0L
    var dataBytes = -1L
    while (i + 8 <= b.length) {
      val typ = cc(b, i.toInt)
      val sz = u32le(b, i.toInt + 4)
      if (typ == "fmt " && i + 8 + 16 <= b.length) {
        ch = u16le(b, i.toInt + 10)
        rate = u32le(b, i.toInt + 12)
        byteRate = u32le(b, i.toInt + 16)
      } else if (typ == "data") dataBytes = sz
      // Long arithmetic: a corrupt 32-bit size near 2^31 must end the
      // walk (next lands past the blob), not wrap negative and re-sync
      // the reader 8 bytes into sample data.
      i += 8 + sz + (sz & 1L)
    }
    if (rate <= 0 || ch <= 0 || byteRate <= 0 || dataBytes < 0) None
    else Some(Meta("wav", rate.toInt, ch, dataBytes * 1000L / byteRate,
      exact = true))
  }

  /** AU (.snd): header carries data offset/size, encoding, rate,
    * channels; PCM encodings 1-5 have known bytes/sample.
    */
  private def au(b: Array[Byte]): Option[Meta] = {
    if (b.length < 24 || !(b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
      b(3) == 'd')) return None
    val dataSize = u32be(b, 8)
    val enc = u32be(b, 12)
    val rate = u32be(b, 16)
    val ch = u32be(b, 20)
    val bytesPer = enc match {
      case 1 | 2 => 1L // µ-law, 8-bit PCM
      case 3     => 2L
      case 4     => 3L
      case 5     => 4L
      case _     => return None
    }
    // rate/ch are raw u32be from the wire: bound them to plausible
    // audio ranges BEFORE the division — unvalidated values up to
    // 2^32-1 can overflow rate*ch*bytesPer through 0 (÷0 task failure)
    // or negative (garbage duration), and wrap negative via .toInt.
    if (rate <= 0 || rate >= (1L << 20) || ch <= 0 || ch > 64 ||
      dataSize < 0 || dataSize == 0xffffffffL) None
    else Some(Meta("au", rate.toInt, ch.toInt,
      dataSize * 1000L / (rate * ch * bytesPer), exact = true))
  }

  /** AIFF/AIFC: COMM chunk — channels, frame count, and the sample
    * rate as an 80-bit IEEE extended float (sign+15-bit exponent,
    * 64-bit mantissa with explicit integer bit).
    */
  private def aiff(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || cc(b, 0) != "FORM" ||
      !(b(8) == 'A' && b(9) == 'I' && b(10) == 'F')) return None
    var i = 12L
    while (i + 8 <= b.length) {
      val typ = cc(b, i.toInt)
      val sz = u32be(b, i.toInt + 4)
      if (typ == "COMM" && i + 8 + 18 <= b.length) {
        val p = i.toInt
        val ch = u16be(b, p + 8)
        val frames = u32be(b, p + 10)
        // 80-bit extended float at p+16: exponent (biased 16383) +
        // 64-bit mantissa; rate = mantissa >> (16383 + 63 - exp).
        val exp = u16be(b, p + 16) & 0x7fff
        var mant = 0L
        var k = 0
        while (k < 8) { mant = (mant << 8) | (b(p + 18 + k) & 0xff); k += 1 }
        val shift = 16383 + 63 - exp
        val rate =
          if (shift <= 0 || shift >= 64 || mant == 0L) 0L
          else mant >>> shift
        if (ch <= 0 || rate <= 0) return None
        return Some(Meta("aiff", rate.toInt, ch,
          frames * 1000L / rate, exact = true))
      }
      i += 8 + sz + (sz & 1L) // Long: corrupt sizes end the walk
    }
    None
  }

  /** FLAC: the STREAMINFO metadata block is REQUIRED first — sample
    * rate (20 bits), channels-1 (3), bits-1 (5), total samples (36)
    * packed at byte 18 of the stream (spec §STREAMINFO).
    */
  private def flac(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 + 4 + 34 || !(b(0) == 'f' && b(1) == 'L' &&
      b(2) == 'a' && b(3) == 'C')) return None
    if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    val p = 8 // STREAMINFO payload
    // min/max blocksize (4) + min/max framesize (6), then the packed
    // 64 bits: rate(20) ch-1(3) bits-1(5) totalSamples(36).
    val hi = u32be(b, p + 10)
    val lo = u32be(b, p + 14)
    val rate = (hi >>> 12).toInt
    val ch = ((hi >>> 9) & 0x7).toInt + 1
    val total = ((hi & 0xfL) << 32) | lo
    if (rate <= 0) None
    else Some(Meta("flac", rate, ch,
      if (total == 0) 0L else total * 1000L / rate, exact = true))
  }

  /** MPEG audio frame-sync validity, ANY layer: version/layer not
    * reserved, bitrate index not free/bad, sample-rate index not
    * reserved (ISO 11172-3 §2.4.1.3). The ONE definition behind both
    * the triage tag ([[MediaRouter]], which accepts Layer I/II — they
    * are MPEG audio) and the metadata parser ([[mp3]], which
    * additionally demands Layer III for its bitrate table).
    */
  private[operators] def validMpegSync(b: Array[Byte], p: Int): Boolean =
    p + 2 < b.length && (b(p) & 0xff) == 0xff && (b(p + 1) & 0xe0) == 0xe0 && {
      val v = (b(p + 1) >> 3) & 0x3
      val l = (b(p + 1) >> 1) & 0x3
      val br = (b(p + 2) >> 4) & 0xf
      val sr = (b(p + 2) >> 2) & 0x3
      v != 1 && l != 0 && br != 0 && br != 0xf && sr != 3
    }

  /** Offset of the first Ogg page's payload (past the lacing table),
    * or -1 when the blob is not an Ogg page / is truncated before the
    * payload (RFC 3533 §6). Shared by triage dispatch and metadata.
    */
  private[operators] def oggFirstPayload(b: Array[Byte]): Int =
    if (b == null || b.length < 28 ||
      !(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')) -1
    else {
      val p = 27 + (b(26) & 0xff)
      if (p < b.length) p else -1
    }

  private val Mp3Rates = Array(44100, 48000, 32000) // MPEG1; /2 V2, /4 V2.5
  private val Mp3BitratesV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitratesV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** MPEG audio (Layer III): first frame header → rate/channels.
    * Duration: if the first frame carries a Xing/Info or VBRI header
    * (the standard VBR frame-count headers — Xing/LAME at 4 + side-info
    * bytes past the frame start, VBRI at a fixed 32), frame count ×
    * samples-per-frame / rate is EXACT; otherwise the CBR estimate
    * audio bytes × 8 / first-frame bitrate, flagged `exact = false`
    * (ID3v2 tag length skipped in both paths).
    */
  private def mp3(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 4) return None
    var p = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // ID3v2 size: 4 syncsafe bytes at 6..9.
      val sz = ((b(6) & 0x7fL) << 21) | ((b(7) & 0x7fL) << 14) |
        ((b(8) & 0x7fL) << 7) | (b(9) & 0x7fL)
      p = (10 + sz).toInt
      if (p + 4 > b.length) return None
    }
    if (!validMpegSync(b, p)) return None
    val ver = (b(p + 1) >> 3) & 0x3 // 3 = MPEG1, 2 = MPEG2, 0 = 2.5
    val layer = (b(p + 1) >> 1) & 0x3 // 1 = Layer III
    val brIdx = (b(p + 2) >> 4) & 0xf
    val srIdx = (b(p + 2) >> 2) & 0x3
    if (layer != 1) return None // duration tables below are Layer III
    val rate = ver match {
      case 3 => Mp3Rates(srIdx)
      case 2 => Mp3Rates(srIdx) / 2
      case _ => Mp3Rates(srIdx) / 4
    }
    val kbps =
      if (ver == 3) Mp3BitratesV1L3(brIdx) else Mp3BitratesV2L3(brIdx)
    val ch = if (((b(p + 3) >> 6) & 0x3) == 3) 1 else 2
    // Xing ("Xing" VBR / "Info" CBR, written by LAME and friends) sits
    // 4 + side-info bytes past the frame start (side info: MPEG1 32/17
    // stereo/mono, MPEG2(.5) 17/9 — ISO 11172-3 §2.4.1.7); Fraunhofer
    // VBRI sits at a fixed 32 bytes past the 4-byte header with the
    // frame count at tag+14. Either way frames × samples-per-frame /
    // rate is exact. Frame counts are u32 wire values: bound to 2^31
    // (≈ 650 days of audio) so a corrupt count falls back to the CBR
    // estimate instead of minting a garbage "exact" duration.
    def tagAt(at: Int, t: String): Boolean =
      at >= 0 && at + 4 <= b.length && b(at) == t(0).toByte &&
        b(at + 1) == t(1).toByte && b(at + 2) == t(2).toByte &&
        b(at + 3) == t(3).toByte
    val spf = if (ver == 3) 1152L else 576L
    val side =
      if (ver == 3) { if (ch == 1) 17 else 32 }
      else { if (ch == 1) 9 else 17 }
    val xo = p + 4 + side
    val vbrFrames: Long =
      if ((tagAt(xo, "Xing") || tagAt(xo, "Info")) && xo + 12 <= b.length &&
        (u32be(b, xo + 4) & 1L) != 0) u32be(b, xo + 8)
      else if (tagAt(p + 36, "VBRI") && p + 36 + 18 <= b.length)
        u32be(b, p + 36 + 14)
      else -1L
    if (vbrFrames > 0 && vbrFrames < (1L << 31))
      Some(Meta("mp3", rate, ch, vbrFrames * spf * 1000L / rate,
        exact = true))
    else if (kbps <= 0) None
    else Some(Meta("mp3", rate, ch,
      (b.length - p).toLong * 8000L / (kbps * 1000L), exact = false))
  }

  /** Ogg vorbis/opus: rate/channels from the identification header on
    * the FIRST page; duration from the TERMINAL page's granule
    * position (vorbis: PCM samples at `rate`; opus: 48 kHz ticks minus
    * the ident header's pre-skip — RFC 7845 §4).
    */
  private def ogg(b: Array[Byte]): Option[Meta] = {
    val p = oggFirstPayload(b)
    if (p < 0 || p + 16 > b.length) return None
    val isVorbis = (b(p) & 0xff) == 0x01 &&
      new String(b, p + 1, 6, "US-ASCII") == "vorbis"
    val isOpus = new String(b, p, 8, "ISO-8859-1") == "OpusHead"
    if (!isVorbis && !isOpus) return None
    // Last page: scan backward for the final "OggS" capture pattern
    // and VALIDATE the candidate as a page header — version must be 0
    // and the header-type flags must fit RFC 3533 §6 with the BOS bit
    // CLEAR (the ident page's granule 0 is not a duration record; an
    // unfinalized live stream must quarantine, not report 0ms). Raw
    // 4-byte matches also occur inside compressed payload bytes; a
    // payload hit would otherwise read garbage as the granule and
    // report a confidently-wrong exact duration. An unset granule
    // (-1: "no packet finishes on this page") rejects too.
    var granule = -1L
    var q = b.length - 27
    while (q > 0 && granule < 0) {
      if (b(q) == 'O' && b(q + 1) == 'g' && b(q + 2) == 'g' &&
        b(q + 3) == 'S' && b(q + 4) == 0 && (b(q + 5) & 0xfa) == 0) {
        val g = u64le(b, q + 6)
        if (g >= 0) granule = g
      }
      q -= 1
    }
    // Ceiling check: a corrupt terminal granule up to 2^63-1 passes
    // g >= 0 but overflows granule*1000 below, reporting a negative
    // duration flagged exact=true. 2^53 ticks is ~5,800 years at
    // 48 kHz — anything above is corrupt, not long.
    if (granule < 0 || granule > (1L << 53)) return None
    if (isVorbis) {
      // ident: type1 + "vorbis" + version4 + channels1 + rate4 (LE).
      if (p + 16 > b.length) return None
      val ch = b(p + 11) & 0xff
      val rate = u32le(b, p + 12)
      // rate is raw u32le: values >= 2^31 wrap negative via .toInt.
      if (rate <= 0 || rate >= (1L << 31) || ch <= 0) None
      else Some(Meta("ogg-vorbis", rate.toInt, ch,
        granule * 1000L / rate, exact = true))
    } else {
      // OpusHead: version1 + channels1 + preskip2(LE) + inputRate4(LE).
      if (p + 16 > b.length) return None
      val ch = b(p + 9) & 0xff
      val preSkip = u16le(b, p + 10)
      val rate = u32le(b, p + 12) // informational input rate
      val samples = math.max(0L, granule - preSkip) // 48 kHz ticks
      if (ch <= 0) None
      else Some(Meta("ogg-opus",
        if (rate > 0 && rate < (1L << 31)) rate.toInt else 48000, ch,
        samples * 1000L / 48000L, exact = true))
    }
  }

  /** Audio-only BMFF (.m4a): duration from mvhd (version 0/1),
    * rate/channels left 0 (they live in the stsd sample entry, whose
    * layout is codec-specific; duration is the curation-relevant
    * field).
    */
  private def m4a(b: Array[Byte]): Option[Meta] =
    VideoContainer.audioOnlyMp4Meta(b).flatMap {
      case (_, Some(ms)) => Some(Meta("m4a", 0, 0, ms, exact = true))
      case _             => None // mvhd-less: triage tags it, no math
    }

  /** Parse the leading bytes (and for Ogg, the terminal page header);
    * None for null/unknown/corrupt blobs.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    if (bytes == null) None
    else wav(bytes).orElse(au(bytes)).orElse(aiff(bytes))
      .orElse(flac(bytes)).orElse(ogg(bytes)).orElse(mp3(bytes))
      .orElse(m4a(bytes))

  /** struct(format, sample_rate, channels, duration_ms, exact), null
    * when the blob is not a recognized audio container.
    */
  def audioMeta(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      parse(b).map(m =>
        (m.format, m.sampleRate, m.channels, m.durationMs, m.exact))
    }
    f(blob).cast("struct<format:string,sample_rate:int,channels:int," +
      "duration_ms:bigint,exact:boolean>")
  }
}

/** Deterministic audio-container fixtures — the audio members of the
  * media fixture family ([[VideoFixtures]]): real spec-conformant
  * header bytes from integer parameters, so [[AudioContainer.parse]]
  * gates as a build∘parse identity whose expected output is pure
  * arithmetic a SQL oracle can replay.
  */
object AudioFixtures {
  import VideoFixtures.W // the family's shared byte writer

  /** PCM-16 WAV: fmt + a zeroed data chunk of `nSamples` frames. */
  def wav(rate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(rate > 0 && channels > 0 && nSamples >= 0)
    val dataBytes = nSamples * channels * 2
    val w = new W
    w.cc("RIFF").u32le(36L + dataBytes).cc("WAVE")
    w.cc("fmt ").u32le(16L)
      .u16le(1).u16le(channels).u32le(rate.toLong)
      .u32le(rate.toLong * channels * 2)
      .u16le(channels * 2).u16le(16)
    w.cc("data").u32le(dataBytes.toLong).zeros(dataBytes)
    w.result()
  }

  /** FLAC stream header: "fLaC" + a last-flagged STREAMINFO block. */
  def flac(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20) && channels >= 1 && channels <= 8 &&
      totalSamples >= 0 && totalSamples < (1L << 36))
    val w = new W
    w.cc("fLaC")
    w.u8(0x80).u8(0).u8(0).u8(34) // last-block | STREAMINFO, length 34
    w.u16(4096).u16(4096) // min/max blocksize
    w.u8(0).u16(0).u8(0).u16(0) // min/max framesize (u24 x2)
    val hi = (rate.toLong << 12) | ((channels - 1L) << 9) |
      (15L << 4) | (totalSamples >>> 32) // bits-1 = 15 (16-bit)
    w.u32(hi).u32(totalSamples & 0xffffffffL)
    w.zeros(16) // md5
    w.result()
  }

  /** Bare MPEG1 Layer III stream: one valid frame header + zero fill
    * to `totalBytes` (CBR estimate shape). `kbps` must be a Layer III
    * MPEG1 table rate; sample rate fixed at 44100 (index 0).
    */
  def mp3(kbps: Int, totalBytes: Int, stereo: Boolean = true): Array[Byte] = {
    val brIdx = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320).indexOf(kbps)
    require(brIdx > 0, s"not an MPEG1 L3 bitrate: $kbps")
    require(totalBytes >= 4)
    val w = new W
    w.u8(0xff).u8(0xfb) // sync + MPEG1 + Layer III + no CRC
    w.u8((brIdx << 4) | (0 << 2)) // bitrate idx + 44.1 kHz + no pad
    w.u8(if (stereo) 0x00 else 0xc0)
    w.zeros(totalBytes - 4)
    w.result()
  }

  /** MPEG1 Layer III whose first frame carries a Xing-family header:
    * frame header + zeroed side info (32/17 bytes stereo/mono) + `tag`
    * ("Xing" for VBR, "Info" for LAME-tagged CBR) + frames-present
    * flags + the frame count, zero-filled to `totalBytes`. Sample rate
    * fixed at 44100; the nominal bitrate index (128 kbps) is what a
    * Xing-unaware parser would misuse.
    */
  def mp3Xing(frames: Long, totalBytes: Int, stereo: Boolean = true,
      tag: String = "Xing"): Array[Byte] = {
    require(frames >= 0 && frames < (1L << 32))
    require(tag == "Xing" || tag == "Info", s"not a Xing-family tag: $tag")
    val side = if (stereo) 32 else 17
    val used = 4 + side + 12
    require(totalBytes >= used, s"totalBytes $totalBytes < header $used")
    val w = new W
    w.u8(0xff).u8(0xfb) // sync + MPEG1 + Layer III + no CRC
    w.u8((9 << 4) | (0 << 2)) // 128 kbps nominal + 44.1 kHz + no pad
    w.u8(if (stereo) 0x00 else 0xc0)
    w.zeros(side)
    w.cc(tag).u32(0x1L).u32(frames) // flags: frames present
    w.zeros(totalBytes - used)
    w.result()
  }

  /** MPEG1 Layer III with a Fraunhofer VBRI header: always 32 bytes
    * past the 4-byte frame header (stereo side-info width), frame
    * count at tag+14 per the VBRI layout (version, delay, quality,
    * bytes, frames).
    */
  def mp3Vbri(frames: Long, totalBytes: Int): Array[Byte] = {
    require(frames >= 0 && frames < (1L << 32))
    val used = 4 + 32 + 18
    require(totalBytes >= used, s"totalBytes $totalBytes < header $used")
    val w = new W
    w.u8(0xff).u8(0xfb).u8((9 << 4) | (0 << 2)).u8(0x00) // stereo
    w.zeros(32)
    w.cc("VBRI").u16(1).u16(0).u16(0) // version, delay, quality
    w.u32(totalBytes.toLong).u32(frames)
    w.zeros(totalBytes - used)
    w.result()
  }

  /** Ogg Vorbis: a BOS page carrying the identification header and an
    * EOS page whose granule position is the PCM sample total.
    */
  def oggVorbis(rate: Int, channels: Int, granule: Long): Array[Byte] = {
    require(rate > 0 && channels > 0 && granule >= 0)
    def page(typ: Int, gran: Long, payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 255)
      val w = new W
      w.cc("OggS").u8(0).u8(typ).u64le(gran)
      w.u32le(1L).u32le(0L).u32le(0L) // serial, seq, crc (parser-ignored)
      w.u8(1).u8(payload.length)
      w.bytes(payload).result()
    }
    val ident = new W
    ident.u8(0x01).cc("vorbis").u32le(0L) // type + name + version
      .u8(channels).u32le(rate.toLong)
      .zeros(12) // bitrate fields
      .u8(0xb8).u8(0x01) // blocksizes + framing
    page(0x02, 0L, ident.result()) ++
      page(0x04, granule, Array[Byte](0))
  }

  /** Audio-only BMFF with an mvhd — [[VideoFixtures.m4a]]'s shape with
    * the duration fields set.
    */
  def m4a(timescale: Int, duration: Long,
      brand: String = "M4A "): Array[Byte] = {
    require(timescale > 0 && duration >= 0)
    VideoFixtures.m4a(brand, timescale, duration)
  }

  /** PCM-16 mono WAV carrying REAL samples. */
  def wavSamples(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0)
    val w = new W
    w.cc("RIFF").u32le(36L + samples.length * 2).cc("WAVE")
    w.cc("fmt ").u32le(16L)
      .u16le(1).u16le(1).u32le(rate.toLong)
      .u32le(rate.toLong * 2).u16le(2).u16le(16)
    w.cc("data").u32le(samples.length * 2L)
    samples.foreach(s => w.u16le(s & 0xffff))
    w.result()
  }

  /** FLAC gate PCM (q192): deterministic multi-tone whose LENGTH is
    * pure doc arithmetic the SQL oracle replays — 2000 + (doc_id%7)·501
    * frames, 1 + doc_id%2 channels, interleaved 16-bit. Content mixes
    * two doc-keyed tones plus a small integer hash ripple so every
    * predictor family (constant folds excluded, fixed and LPC both
    * gainful, Rice parameters non-degenerate) does real work.
    */
  def flacPcm(docId: Long): Array[Int] = {
    val ch = 1 + (docId % 2).toInt
    val n = 2000 + (docId % 7).toInt * 501
    val out = new Array[Int](n * ch)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val f = 0.011 * (1 + c) + 0.0003 * (docId % 13)
        val v = 0.55 * math.sin(2 * math.Pi * f * i + 0.1 * (docId % 8)) +
          0.22 * math.sin(2 * math.Pi * f * 2.7 * i) +
          0.04 * (java.lang.Long.remainderUnsigned(
            VideoFixtures.mix64(docId * 8191 + i * 8L + c), 97L) - 48L) / 48.0
        out(i * ch + c) =
          math.max(-32768, math.min(32767, math.round(v * 32000).toInt))
        c += 1
      }
      i += 1
    }
    out
  }

  /** Wild-WAV codec gate PCM (q194): a smooth doc-keyed two-tone at
    * 0.4 FS whose LENGTH is pure doc arithmetic — (505 mono / 249
    * stereo samples-per-block at blockAlign 256) × (4 + doc_id%4)
    * whole IMA blocks, 1 + doc_id%2 channels — so the same buffer
    * renders as IMA ADPCM / µ-law / A-law and the oracle replays the
    * frame count. Smoothness keeps every codec inside its designed
    * error envelope (ADPCM tracks slopes, G.711 quantizes levels).
    */
  def codecTonePcm(docId: Long): Array[Int] = {
    val ch = 1 + (docId % 2).toInt
    val spb = if (ch == 1) 505 else 249
    val n = spb * (4 + (docId % 4).toInt)
    val out = new Array[Int](n * ch)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < ch) {
        val f = 0.014 * (1 + c) + 0.0004 * (docId % 11)
        val v = 0.33 * math.sin(2 * math.Pi * f * i + 0.2 * (docId % 6)) +
          0.07 * math.sin(2 * math.Pi * f * 3.3 * i)
        out(i * ch + c) = math.round(v * 32767).toInt
        c += 1
      }
      i += 1
    }
    out
  }

  /** PCM-8 (unsigned, 128 = zero) mono WAV — the requantized variant
    * shape of a near-dup pipeline.
    */
  def wavSamples8(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0)
    val w = new W
    w.cc("RIFF").u32le(36L + samples.length).cc("WAVE")
    w.cc("fmt ").u32le(16L)
      .u16le(1).u16le(1).u32le(rate.toLong)
      .u32le(rate.toLong).u16le(1).u16le(8)
    w.cc("data").u32le(samples.length.toLong)
    samples.foreach { s =>
      w.u8(128 + (s / 256)) // 16-bit signed -> 8-bit unsigned
    }
    w.result()
  }

  // ---- near-duplicate audio clusters (the q191 realistic corpus) ----

  /** 65 window amplitudes for one cluster key — the audio twin of the
    * image pattern ([[VideoFixtures.neardupPattern]]), built on the
    * same max-entropy height walk ([[VideoFixtures.parryStep]], 6
    * amplitudes spaced 0.155 over [0.08, 0.855]): every neighbor pair
    * exactly one margin apart (≥ 2.9× mean-square ratio at the low
    * end, far above requantization/dither noise) with near-fair
    * comparison bits (≈49 bits of sequence entropy, so independent
    * clusters cannot land within the join's maxDist at gate corpora —
    * a naive margin chain collided at sf1). Exactly two designed
    * "tie" windows (indexes keyed per cluster) hold the walk and sit
    * only +0.004 above their left neighbor — encoder noise decides
    * those envelope bits per variant, bounding within-cluster hamming
    * distance at 2 without fixing it at 0.
    */
  private[operators] def neardupEnvelope(key: Long): Array[Double] = {
    val amp = new Array[Double](65)
    def mix(z: Long) = VideoFixtures.mix64(z)
    def ampOf(h: Int): Double = 0.08 + h * 0.155
    val tie = Array(
      1 + java.lang.Long.remainderUnsigned(mix(key ^ 0xA11D10L), 30).toInt,
      34 + java.lang.Long.remainderUnsigned(mix(key ^ 0x5EC02DL), 30).toInt)
    var h = (VideoFixtures.rnd01(key, 5000) * 6).toInt
    amp(0) = ampOf(h) // window 0 is never a tie (ties start at 1)
    var i = 1
    while (i < 65) {
      if (i == tie(0) || i == tie(1)) amp(i) = ampOf(h) + 0.004
      else {
        h = VideoFixtures.parryStep(h, 6, VideoFixtures.rnd01(key, i))
        amp(i) = ampOf(h)
      }
      i += 1
    }
    amp
  }

  /** One member of a near-duplicate AUDIO cluster — real pipeline
    * variants of the cluster's base clip, all decodable WAV: member 0
    * is the base (16-bit, 8 kHz, 65 windows × 25 ms of a 200 Hz tone
    * at the cluster's envelope); 1 requantizes to 8-bit; 2 is the
    * 12 kHz rendering (same duration and envelope — an ideal 1.5×
    * resample); 3 scales gain to 0.9 and adds deterministic ±0.004
    * dither. `far = true` swaps in an unrelated envelope stream
    * (key-disjoint via bitwise NOT).
    */
  def neardupWav(cluster: Long, member: Int, far: Boolean = false)
      : Array[Byte] = {
    val key = if (far) ~cluster else cluster
    val amp = neardupEnvelope(key)
    val rate = if (!far && member == 2) 12000 else 8000
    val framesPerWin = rate / 40 // 25 ms windows; 200 Hz -> 5 periods
    val gain = if (!far && member == 3) 0.9 else 1.0
    val dither = !far && member == 3
    val out = new Array[Short](65 * framesPerWin)
    var w = 0
    while (w < 65) {
      var j = 0
      while (j < framesPerWin) {
        val t = j.toDouble / rate
        var v = gain * amp(w) * math.sin(2 * math.Pi * 200.0 * t)
        if (dither) {
          val r = java.lang.Long.remainderUnsigned(
            VideoFixtures.mix64(key * 31 + w * 1024L + j), 1000L)
          v += (r - 500L) / 500.0 * 0.004
        }
        val s = math.max(-32767, math.min(32767, math.round(v * 32767)))
        out(w * framesPerWin + j) = s.toShort
        j += 1
      }
      w += 1
    }
    if (!far && member == 1) wavSamples8(rate, out)
    else wavSamples(rate, out)
  }
}
