package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream}

/** FLAC (RFC 9639) — the engine's first REAL compressed-codec SAMPLE
  * decode, closing a measured slice of the documented codec-stub
  * boundary. FLAC is losslessly decodable in pure JVM code from the
  * published IETF spec (RFC 9639, 2024) with zero codec libraries, so
  * unlike AVC/HEVC/MP3/AAC/Opus there is no reason to leave it behind
  * the stub: [[FlacPcm]] ships as a DEFAULT [[SampleDecoder.PcmDecoder]]
  * provider, and every PCM consumer ([[Multimodal]] audio features,
  * [[AudioPhash]] envelope hashes, [[MediaRouter]] triage) decodes
  * FLAC blobs for real with no engine change — exactly the "deployment
  * plugs a decoder" contract the SPI formalized, proven here with a
  * codec implemented from the spec.
  *
  * Decoder scope (the full fixed-blocksize subset a real encoder
  * emits): STREAMINFO + metadata walk; frame sync with CRC-8-verified
  * headers and CRC-16-verified frames; CONSTANT / VERBATIM / FIXED
  * (orders 0-4) / LPC (orders 1-32, quantized coefficients) subframes;
  * Rice and Rice2 partitioned residuals including the escape (raw
  * verbatim) partition form; independent / left-side / right-side /
  * mid-side stereo decorrelation; wasted-bits shifts; 8/12/16/20/24-bit
  * sample depths. Anything malformed — bad sync, CRC mismatch, reserved
  * codes, residual overrun, a sample-count drift against STREAMINFO —
  * decodes to None: one corrupt blob quarantines, it never aborts a
  * job (the engine-wide dirty-input contract).
  *
  * [[encode]] is a genuine subset encoder (constant detection, best-of
  * fixed orders, Levinson-Durbin LPC, per-partition Rice parameter
  * fit, optional mid/side, wasted-bits detection) used by the fixture
  * layer: gates and specs prove encode∘decode is the IDENTITY on the
  * samples — the lossless contract — rather than eyeballing a golden
  * blob. Scale shape: both directions are narrow per-row kernels; no
  * shuffle, no driver state.
  */
object Flac {

  // ---- CRCs (RFC 9639 §9.1.1, §9.3: CRC-8 poly 0x07, CRC-16 poly
  // 0x8005, both init 0, MSB-first).
  private val crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
      t(i) = c & 0xff
      i += 1
    }
    t
  }
  private val crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1; k += 1 }
      t(i) = c & 0xffff
      i += 1
    }
    t
  }
  private[operators] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }
  private[operators] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = crc16Table(((c >>> 8) ^ (b(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  /** MSB-first bit reader; reads past the end throw (callers wrap in
    * the quarantine Try). Byte-granular position is exposed so frame
    * CRCs cover exactly the bytes the spec says they do.
    */
  private final class Bits(b: Array[Byte], startByte: Int) {
    private var pos = startByte.toLong * 8
    def bytePos: Int = {
      require((pos & 7) == 0); (pos >> 3).toInt
    }
    def aligned: Boolean = (pos & 7) == 0
    def alignSkip(): Unit = while ((pos & 7) != 0) pos += 1
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val byte = (pos >> 3).toInt
        if (byte >= b.length) throw new IndexOutOfBoundsException
        v = (v << 1) | ((b(byte) >> (7 - (pos & 7)).toInt) & 1)
        pos += 1; k += 1
      }
      v
    }
    /** n-bit two's-complement signed value, n <= 31 (every signed
      * field the subset reads: samples <= 25 bits with the side
      * channel, LPC coefficients <= 15, escape raw widths <= 31 by
      * their 5-bit width field).
      */
    def s(n: Int): Int = {
      if (n == 0) return 0
      if (n > 31) throw new IllegalArgumentException(s"signed width $n")
      val v = u(n)
      if ((v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (u(1) == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalArgumentException("unary runaway")
      }
      q
    }
  }

  /** Decoded stream: interleaved samples at the source bit depth. */
  final case class Pcm(rate: Int, channels: Int, bits: Int,
      samples: Array[Int])

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Full-stream decode; None on ANY malformation (quarantine rule).
    * When STREAMINFO carries a nonzero total sample count the decoded
    * count must match it exactly — a silent truncation is corruption,
    * not a shorter song.
    *
    * `maxDecodedBytes` is the DECOMPRESSION-BOMB guard: FLAC's
    * constant frames expand ~10,000× (13 bytes → 32768 samples), so a
    * crafted blob could otherwise drive per-frame allocations into an
    * executor OOM — an Error the quarantine catch cannot contain. The
    * running decoded volume (4 bytes per sample value) is checked
    * before every frame materializes; past the cap the blob
    * quarantines. The default (256 MiB ≈ 45 min of 44.1 kHz stereo
    * 16-bit) is a per-BLOB bound chosen for corpus work where media
    * cells are clips, not albums; a deployment decoding long-form
    * audio passes its own budget.
    */
  def decode(b: Array[Byte],
      maxDecodedBytes: Long = 256L << 20): Option[Pcm] =
    try decodeStrict(b, maxDecodedBytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeStrict(b: Array[Byte], maxDecodedBytes: Long): Option[Pcm] = {
    if (b == null || b.length < 42) return None
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return None
    // Metadata walk; STREAMINFO must be the first block (§8.1).
    var p = 4
    var last = false
    var first = true
    var rate = 0; var channels = 0; var bits = 0; var total = 0L
    while (!last) {
      if (p + 4 > b.length) return None
      val h = b(p) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (typ == 127) return None // forbidden block type
      if (first) {
        if (typ != 0 || len != 34) return None
        val s = p + 4
        if (s + 34 > b.length) return None
        rate = ((b(s + 10) & 0xff) << 12) | ((b(s + 11) & 0xff) << 4) |
          ((b(s + 12) & 0xff) >>> 4)
        channels = ((b(s + 12) >>> 1) & 0x7) + 1
        bits = (((b(s + 12) & 1) << 4) | ((b(s + 13) & 0xff) >>> 4)) + 1
        total = ((b(s + 13) & 0xfL) << 32) | ((b(s + 14) & 0xffL) << 24) |
          ((b(s + 15) & 0xffL) << 16) | ((b(s + 16) & 0xffL) << 8) |
          (b(s + 17) & 0xffL)
        first = false
      }
      p += 4 + len
      if (p > b.length) return None
    }
    // Depth scope: 4..24-bit streams (+1-bit side channels stay inside
    // Int/32-bit bit-reads). 32-bit FLAC (new in RFC 9639) needs 33-bit
    // side-channel reads — out of the declared subset, quarantined.
    if (rate <= 0 || channels < 1 || channels > 8 || bits < 4 || bits > 24)
      return None
    // Bomb guard, STREAMINFO form: a declared total past the budget
    // quarantines before any frame allocates.
    if (total > 0 && total * channels * 4 > maxDecodedBytes) return None

    val out = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
    var decoded = 0L
    var done = total > 0 && decoded >= total
    while (!done && p < b.length) {
      // Bomb guard, running form (unknown-total streams only — the
      // known-total path is bounded upfront and the loop stops at
      // total): the NEXT frame may add at most 65535 samples/channel.
      if (total == 0 &&
        (decoded + 65535L) * channels * 4 > maxDecodedBytes) return None
      val frame = decodeFrame(b, p, rate, channels, bits) match {
        case Some(f) => f
        case None => return None
      }
      out.add(frame._1)
      decoded += frame._1.length / channels
      p = frame._2
      if (total > 0 && decoded >= total) done = true
      else if (p >= b.length) done = true
    }
    if (total > 0 && decoded != total) return None
    if (total == 0 && decoded == 0) return None
    var n = 0
    val it0 = out.iterator()
    while (it0.hasNext) n += it0.next().length
    val all = new Array[Int](n)
    var off = 0
    val it = out.iterator()
    while (it.hasNext) {
      val f = it.next()
      System.arraycopy(f, 0, all, off, f.length)
      off += f.length
    }
    Some(Pcm(rate, channels, bits, all))
  }

  /** One frame from byte offset `p`; returns (interleaved samples,
    * next byte offset). None / throw on malformation.
    */
  private def decodeFrame(b: Array[Byte], p: Int, siRate: Int,
      siChannels: Int, siBits: Int): Option[(Array[Int], Int)] = {
    val r = new Bits(b, p)
    if (r.u(14) != 0x3ffe) return None // sync
    if (r.u(1) != 0) return None // reserved
    r.u(1) // blocking strategy (coded number width differs; both read below)
    val bsCode = r.u(4)
    val srCode = r.u(4)
    val chanAsgn = r.u(4)
    val bpsCode = r.u(3)
    if (r.u(1) != 0) return None // reserved
    // UTF-8-style coded frame/sample number (§9.1.1): 1-7 bytes.
    val lead = r.u(8)
    var extra = 0
    if ((lead & 0x80) == 0) extra = 0
    else if ((lead & 0xe0) == 0xc0) extra = 1
    else if ((lead & 0xf0) == 0xe0) extra = 2
    else if ((lead & 0xf8) == 0xf0) extra = 3
    else if ((lead & 0xfc) == 0xf8) extra = 4
    else if ((lead & 0xfe) == 0xfc) extra = 5
    else if (lead == 0xfe) extra = 6
    else return None
    var k = 0
    while (k < extra) {
      if ((r.u(8) & 0xc0) != 0x80) return None
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => return None
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.u(8) + 1
      case 7 => r.u(16) + 1
      case c => 256 << (c - 8)
    }
    val rate = srCode match {
      case 0 => siRate
      case 1 => 88200
      case 2 => 176400
      case 3 => 192000
      case 4 => 8000
      case 5 => 16000
      case 6 => 22050
      case 7 => 24000
      case 8 => 32000
      case 9 => 44100
      case 10 => 48000
      case 11 => 96000
      case 12 => r.u(8) * 1000
      case 13 => r.u(16)
      case 14 => r.u(16) * 10
      case _ => return None
    }
    if (rate != siRate) return None
    val channels = if (chanAsgn <= 7) chanAsgn + 1
      else if (chanAsgn <= 10) 2
      else return None
    if (channels != siChannels) return None
    val bps = bpsCode match {
      case 0 => siBits
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return None
    }
    if (bps != siBits) return None
    // CRC-8 over the header bytes read so far (byte-aligned here).
    if (!r.aligned) return None
    val hdrEnd = r.bytePos
    if (r.u(8) != crc8(b, p, hdrEnd)) return None

    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val sideBit = chanAsgn match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + sideBit)
      c += 1
    }
    // Undo decorrelation (§4.2; side math in Long to survive bps=32).
    if (chanAsgn == 8) { // left/side: right = left - side
      var i = 0
      while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
    } else if (chanAsgn == 9) { // right/side: ch0=side, ch1=right; left = right + side
      var i = 0
      while (i < blockSize) { chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
    } else if (chanAsgn == 10) { // mid/side
      var i = 0
      while (i < blockSize) {
        val side = chans(1)(i)
        var mid = chans(0)(i).toLong << 1
        mid |= (side & 1L)
        chans(0)(i) = ((mid + side) >> 1).toInt
        chans(1)(i) = ((mid - side) >> 1).toInt
        i += 1
      }
    }
    if (!r.aligned) r.alignSkip()
    val frameEnd = r.bytePos
    if (r.u(16) != crc16(b, p, frameEnd)) return None
    val inter = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      var ch = 0
      while (ch < channels) { inter(i * channels + ch) = chans(ch)(i); ch += 1 }
      i += 1
    }
    Some((inter, r.bytePos))
  }

  private def decodeSubframe(r: Bits, n: Int, bps: Int): Array[Int] = {
    if (r.u(1) != 0) throw new IllegalArgumentException("subframe pad")
    val typ = r.u(6)
    val wasted = if (r.u(1) == 1) 1 + r.unary() else 0
    val eb = bps - wasted
    if (eb <= 0) throw new IllegalArgumentException("wasted >= bps")
    val out = new Array[Int](n)
    if (typ == 0) { // CONSTANT
      val v = r.s(eb)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.s(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
      val order = typ & 0x07
      var i = 0
      while (i < order) { out(i) = r.s(eb); i += 1 }
      decodeResidual(r, n, order, out)
      val cf = FixedCoefs(order)
      i = order
      while (i < n) {
        var acc = out(i).toLong
        var j = 0
        while (j < order) { acc += cf(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = acc.toInt
        i += 1
      }
    } else if ((typ & 0x20) != 0) { // LPC, order 1..32
      val order = (typ & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = r.s(eb); i += 1 }
      val precM1 = r.u(4)
      if (precM1 == 15) throw new IllegalArgumentException("lpc precision")
      val prec = precM1 + 1
      val shift = r.s(5)
      if (shift < 0) throw new IllegalArgumentException("negative lpc shift")
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = r.s(prec); i += 1 }
      decodeResidual(r, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe $typ")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice/Rice2 partitioned residual (§9.2.7) decoded INTO out[order..). */
  private def decodeResidual(r: Bits, n: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = r.u(2)
    if (method > 1) throw new IllegalArgumentException("residual method")
    val pb = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.u(4)
    val parts = 1 << partOrder
    if (n % parts != 0) throw new IllegalArgumentException("partition size")
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (n >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) throw new IllegalArgumentException("partition underflow")
      val param = r.u(pb)
      if (param == escape) {
        val raw = r.u(5)
        var i = 0
        while (i < count) { out(idx) = if (raw == 0) 0 else r.s(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val rem = if (param == 0) 0 else r.u(param)
          val v = (q.toLong << param) | rem
          out(idx) = ((v >>> 1) ^ -(v & 1L)).toInt // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // =====================================================================
  // Encoder (fixture-grade but genuinely conformant subset).
  // =====================================================================

  sealed trait Predictor extends Serializable
  case object Auto extends Predictor
  case object VerbatimOnly extends Predictor
  final case class Fixed(order: Int) extends Predictor
  /** Levinson-Durbin LPC of the given order (clamped to the block). */
  final case class Lpc(order: Int) extends Predictor

  sealed trait Stereo extends Serializable
  case object Independent extends Stereo
  case object LeftSide extends Stereo
  case object RightSide extends Stereo
  case object MidSide extends Stereo

  private final class BitW {
    private var buf = new Array[Byte](1024)
    private var len = 0
    private var cur = 0
    private var nb = 0
    def byteLen: Int = { require(nb == 0); len }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    /** CRCs over the LIVE buffer — no copy. `bytes` copies the whole
      * accumulated stream, which made per-frame CRCs quadratic in
      * stream length (every frame re-copied everything before it).
      */
    def crc8Range(from: Int, until: Int): Int = crc8(buf, from, until)
    def crc16Range(from: Int, until: Int): Int = crc16(buf, from, until)
    def u(v: Long, n: Int): this.type = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >>> k) & 1L).toInt
        nb += 1
        if (nb == 8) {
          if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
          buf(len) = cur.toByte; len += 1; cur = 0; nb = 0
        }
        k -= 1
      }
      this
    }
    def s(v: Int, n: Int): this.type = u(v.toLong & ((1L << n) - 1), n)
    def align(): this.type = { while (nb != 0) u(0, 1); this }
    def cc(t: String): this.type = { t.foreach(ch => u(ch.toLong, 8)); this }
  }

  /** Encode interleaved samples. Lossless: decode(encode(x)) == x by
    * construction — residuals are computed from the SAME quantized
    * predictors the stream carries. `partOrder` is clamped so every
    * partition is non-empty; `escapeAll` forces the raw-verbatim
    * escape partition form (decoder-coverage knob).
    */
  def encode(samples: Array[Int], channels: Int, rate: Int, bps: Int = 16,
      blockSize: Int = 4096, predictor: Predictor = Auto,
      stereo: Stereo = Independent, partOrder: Int = 0,
      escapeAll: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "channels 1..8")
    require(rate > 0 && rate < (1 << 20), "rate")
    require(bps >= 8 && bps <= 24, "encoder supports bps 8..24")
    require(blockSize >= 16 && blockSize <= 65535, "blockSize")
    require(samples.length % channels == 0, "ragged interleave")
    require(stereo == Independent || channels == 2, "stereo modes need 2ch")
    val total = samples.length / channels
    val w = new BitW
    w.cc("fLaC")
    // STREAMINFO, last-flagged.
    w.u(0x80, 8).u(34, 24)
    w.u(blockSize.toLong, 16).u(blockSize.toLong, 16)
    w.u(0, 24).u(0, 24) // min/max framesize unknown
    w.u(rate.toLong, 20).u(channels - 1L, 3).u(bps - 1L, 5)
    w.u(total.toLong, 36)
    w.u(0, 64).u(0, 64) // md5 unset (16 zero bytes)
    var frameIx = 0L
    var off = 0
    while (off < total) {
      val n = math.min(blockSize, total - off)
      encodeFrame(w, samples, channels, off, n, rate, bps, frameIx,
        predictor, stereo, partOrder, escapeAll)
      off += n
      frameIx += 1
    }
    w.bytes
  }

  /** The coded (UTF-8-style) frame number, §9.1.1. */
  private def codedNumber(w: BitW, v: Long): Unit = {
    if (v < 0x80) w.u(v, 8)
    else if (v < 0x800) { w.u(0xc0L | (v >>> 6), 8); w.u(0x80L | (v & 0x3f), 8) }
    else if (v < 0x10000) {
      w.u(0xe0L | (v >>> 12), 8)
      w.u(0x80L | ((v >>> 6) & 0x3f), 8); w.u(0x80L | (v & 0x3f), 8)
    } else {
      // Frames beyond 2^16 do not arise in fixture-scale streams, but
      // keep the next width for safety (up to 2^21).
      require(v < (1L << 21), "frame index width")
      w.u(0xf0L | (v >>> 18), 8)
      w.u(0x80L | ((v >>> 12) & 0x3f), 8)
      w.u(0x80L | ((v >>> 6) & 0x3f), 8); w.u(0x80L | (v & 0x3f), 8)
    }
  }

  private def encodeFrame(w: BitW, samples: Array[Int], channels: Int,
      off: Int, n: Int, rate: Int, bps: Int, frameIx: Long,
      predictor: Predictor, stereo: Stereo, partOrder: Int,
      escapeAll: Boolean): Unit = {
    val start = w.byteLen
    w.u(0x3ffe, 14).u(0, 1).u(0, 1) // sync, reserved, fixed blocking
    // Block size: prefer an exact table code, else 16-bit form.
    val bsCode = n match {
      case 192 => 1
      case 576 => 2
      case 1152 => 3
      case 2304 => 4
      case 4608 => 5
      case 256 => 8
      case 512 => 9
      case 1024 => 10
      case 2048 => 11
      case 4096 => 12
      case 8192 => 13
      case 16384 => 14
      case 32768 => 15
      case _ => 7
    }
    val srCode = rate match {
      case 88200 => 1
      case 176400 => 2
      case 192000 => 3
      case 8000 => 4
      case 16000 => 5
      case 22050 => 6
      case 24000 => 7
      case 32000 => 8
      case 44100 => 9
      case 48000 => 10
      case 96000 => 11
      case _ => 0 // from STREAMINFO
    }
    val chanAsgn = stereo match {
      case Independent => channels - 1
      case LeftSide => 8
      case RightSide => 9
      case MidSide => 10
    }
    val bpsCode = bps match {
      case 8 => 1
      case 12 => 2
      case 16 => 4
      case 20 => 5
      case 24 => 6
      case _ => 0
    }
    w.u(bsCode.toLong, 4).u(srCode.toLong, 4)
    w.u(chanAsgn.toLong, 4).u(bpsCode.toLong, 3).u(0, 1)
    codedNumber(w, frameIx)
    if (bsCode == 7) w.u(n - 1L, 16)
    w.u(w.crc8Range(start, w.byteLen).toLong, 8)

    // Deinterleave + decorrelate.
    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val a = new Array[Int](n)
      var i = 0
      while (i < n) { a(i) = samples((off + i) * channels + c); i += 1 }
      chans(c) = a
      c += 1
    }
    val (sub0, sub1bits): (Array[Array[Int]], Array[Int]) = stereo match {
      case Independent => (chans, Array.fill(channels)(bps))
      case LeftSide =>
        val side = new Array[Int](n)
        var i = 0
        while (i < n) { side(i) = chans(0)(i) - chans(1)(i); i += 1 }
        (Array(chans(0), side), Array(bps, bps + 1))
      case RightSide =>
        val side = new Array[Int](n)
        var i = 0
        while (i < n) { side(i) = chans(0)(i) - chans(1)(i); i += 1 }
        (Array(side, chans(1)), Array(bps + 1, bps))
      case MidSide =>
        val mid = new Array[Int](n)
        val side = new Array[Int](n)
        var i = 0
        while (i < n) {
          val l = chans(0)(i); val r = chans(1)(i)
          mid(i) = (l + r) >> 1
          side(i) = l - r
          i += 1
        }
        (Array(mid, side), Array(bps, bps + 1))
    }
    c = 0
    while (c < sub0.length) {
      encodeSubframe(w, sub0(c), sub1bits(c), predictor, partOrder, escapeAll)
      c += 1
    }
    w.align()
    w.u(w.crc16Range(start, w.byteLen).toLong, 16)
  }

  private def encodeSubframe(w: BitW, x: Array[Int], bps: Int,
      predictor: Predictor, partOrder: Int, escapeAll: Boolean): Unit = {
    val n = x.length
    // Wasted bits: shift out any common low zero bits (skip for an
    // all-zero block — CONSTANT handles it in one sample).
    var orAll = 0
    var i = 0
    while (i < n) { orAll |= x(i); i += 1 }
    var wasted = 0
    if (orAll != 0) {
      wasted = java.lang.Integer.numberOfTrailingZeros(orAll)
      if (wasted > bps - 1) wasted = bps - 1
    }
    val eb = bps - wasted
    val y = if (wasted == 0) x else {
      val a = new Array[Int](n)
      i = 0
      while (i < n) { a(i) = x(i) >> wasted; i += 1 }
      a
    }
    def writeWasted(): Unit =
      if (wasted == 0) w.u(0, 1)
      else { w.u(1, 1); var k = 1; while (k < wasted) { w.u(0, 1); k += 1 }; w.u(1, 1) }

    var const = true
    i = 1
    while (i < n && const) { if (y(i) != y(0)) const = false; i += 1 }
    if (const && predictor != VerbatimOnly) {
      w.u(0, 1).u(0, 6); writeWasted()
      w.s(y(0), eb)
      return
    }
    val chosen: Either[Unit, (Int, Array[Int], Option[(Array[Int], Int, Int)])] =
      predictor match {
        case VerbatimOnly => Left(())
        case Fixed(o) =>
          require(o >= 0 && o <= 4, "fixed order")
          val oo = math.min(o, n - 1) // tail blocks shorter than the order
          Right((oo, fixedResidual(y, oo), None))
        case Lpc(o) =>
          lpcPlan(y, math.min(o, math.max(1, n - 1))) match {
            case Some((coef, shift, res)) =>
              Right((coef.length, res, Some((coef, 12, shift))))
            case None => Right((2, fixedResidual(y, math.min(2, n - 1)), None))
          }
        case Auto =>
          var best = 0
          var bestRes = fixedResidual(y, 0)
          var bestCost = cost(bestRes, 0)
          var o = 1
          while (o <= 4 && o < n) {
            val res = fixedResidual(y, o)
            val cst = cost(res, o)
            if (cst < bestCost) { best = o; bestRes = res; bestCost = cst }
            o += 1
          }
          Right((best, bestRes, None))
      }
    chosen match {
      case Left(_) =>
        w.u(0, 1).u(1, 6); writeWasted()
        i = 0
        while (i < n) { w.s(y(i), eb); i += 1 }
      case Right((order, res, lpcInfo)) =>
        lpcInfo match {
          case None =>
            w.u(0, 1).u(0x08L | order, 6); writeWasted()
          case Some(_) =>
            w.u(0, 1).u(0x20L | (order - 1), 6); writeWasted()
        }
        i = 0
        while (i < order) { w.s(y(i), eb); i += 1 }
        lpcInfo.foreach { case (coef, prec, shift) =>
          w.u(prec - 1L, 4).s(shift, 5)
          coef.foreach(cv => w.s(cv, prec))
        }
        writeResidual(w, res, order, n, partOrder, escapeAll)
    }
  }

  private def fixedResidual(y: Array[Int], order: Int): Array[Int] = {
    val n = y.length
    val res = new Array[Int](n - order)
    val cf = FixedCoefs(order)
    var i = order
    while (i < n) {
      var acc = y(i).toLong
      var j = 0
      while (j < order) { acc -= cf(j).toLong * y(i - 1 - j); j += 1 }
      res(i - order) = acc.toInt
      i += 1
    }
    res
  }

  private def cost(res: Array[Int], order: Int): Long = {
    var s = 0L
    var i = 0
    while (i < res.length) { s += math.abs(res(i).toLong); i += 1 }
    s + order // tiny tiebreak toward lower order
  }

  /** Levinson-Durbin LPC: returns (quantized coefficients at precision
    * 12, shift, residual) or None when the block is degenerate (near-
    * zero autocorrelation / unquantizable), in which case the caller
    * falls back to a fixed predictor. Residual is computed from the
    * QUANTIZED coefficients, so losslessness never depends on the
    * float path.
    */
  private def lpcPlan(y: Array[Int],
      order: Int): Option[(Array[Int], Int, Array[Int])] = {
    val n = y.length
    if (order < 1 || order >= n) return None
    val r = new Array[Double](order + 1)
    var lag = 0
    while (lag <= order) {
      var s = 0.0
      var i = lag
      while (i < n) { s += y(i).toDouble * y(i - lag); i += 1 }
      r(lag) = s
      lag += 1
    }
    if (r(0) <= 0.0) return None
    val a = new Array[Double](order + 1)
    var err = r(0)
    var m = 1
    while (m <= order) {
      var acc = r(m)
      var j = 1
      while (j < m) { acc -= a(j) * r(m - j); j += 1 }
      val kRef = acc / err
      if (kRef.isNaN || math.abs(kRef) >= 1.0) return None
      val prev = java.util.Arrays.copyOf(a, order + 1)
      a(m) = kRef
      j = 1
      while (j < m) { a(j) = prev(j) - kRef * prev(m - j); j += 1 }
      err *= (1 - kRef * kRef)
      if (err <= 0) return None
      m += 1
    }
    // Quantize at precision 12: shift so the largest coefficient uses
    // the available headroom; clamp into [-2^11, 2^11-1].
    val prec = 12
    var cmax = 0.0
    var j = 1
    while (j <= order) { cmax = math.max(cmax, math.abs(a(j))); j += 1 }
    if (cmax <= 0 || cmax.isNaN || cmax.isInfinite) return None
    var shift = prec - 1 - (math.getExponent(cmax) + 1)
    if (shift > 15) shift = 15
    if (shift < 0) return None
    val coef = new Array[Int](order)
    var errAcc = 0.0
    j = 0
    while (j < order) {
      val ideal = a(j + 1) * (1L << shift) + errAcc
      var q = math.round(ideal).toInt
      val lo = -(1 << (prec - 1)); val hi = (1 << (prec - 1)) - 1
      if (q < lo) q = lo
      if (q > hi) q = hi
      errAcc = ideal - q
      coef(j) = q
      j += 1
    }
    val res = new Array[Int](n - order)
    var i = order
    while (i < n) {
      var acc = 0L
      var k = 0
      while (k < order) { acc += coef(k).toLong * y(i - 1 - k); k += 1 }
      res(i - order) = (y(i) - (acc >> shift)).toInt
      i += 1
    }
    Some((coef, shift, res))
  }

  private def writeResidual(w: BitW, res: Array[Int], order: Int, n: Int,
      partOrderReq: Int, escapeAll: Boolean): Unit = {
    // Clamp the partition order so n divides evenly and partition 0
    // stays non-empty after the warm-up deduction.
    var po = math.max(0, math.min(partOrderReq, 6))
    while (po > 0 && (n % (1 << po) != 0 || (n >> po) <= order)) po -= 1
    val parts = 1 << po
    // Rice2 (5-bit params) iff any partition needs param > 14.
    val params = new Array[Int](parts)
    val rawBits = new Array[Int](parts)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (n >> po) - (if (p == 0) order else 0)
      var sum = 0L
      var mx = 0L
      var i = 0
      while (i < count) {
        val v = res(idx + i)
        val zz = (v.toLong << 1) ^ (v.toLong >> 63)
        sum += zz
        mx = math.max(mx, zz)
        i += 1
      }
      var k = 0
      while (k < 30 && (count.toLong << k) < sum) k += 1
      params(p) = k
      // Escape raw width: enough bits for the widest zigzag-SOURCE
      // value (signed) in this partition. The 5-bit width field caps
      // raw at 31 bits; a partition whose residuals need more (wrapped
      // 32-bit values — only reachable at extreme depth/order combos)
      // gets 0 here, meaning "escape unrepresentable, use Rice" (Rice
      // unary handles any magnitude).
      var rb = 1
      while (rb < 32 && mx >= (1L << rb)) rb += 1
      rawBits(p) = if (rb + 1 <= 31) rb + 1 else 0
      idx += count
      p += 1
    }
    val needRice2 = escapeAll || params.exists(_ > 14)
    val method = if (needRice2) 1 else 0
    val pb = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    w.u(method.toLong, 2).u(po.toLong, 4)
    idx = 0
    p = 0
    while (p < parts) {
      val count = (n >> po) - (if (p == 0) order else 0)
      if ((escapeAll || params(p) >= escape) && rawBits(p) > 0) {
        val rb = rawBits(p)
        w.u(escape.toLong, pb).u(rb.toLong, 5)
        var i = 0
        while (i < count) { w.s(res(idx + i), rb); i += 1 }
      } else {
        val k = params(p)
        w.u(k.toLong, pb)
        var i = 0
        while (i < count) {
          val v = res(idx + i)
          val zz = (v.toLong << 1) ^ (v.toLong >> 63)
          val q = (zz >>> k).toInt
          var z = 0
          while (z < q) { w.u(0, 1); z += 1 }
          w.u(1, 1)
          if (k > 0) w.u(zz & ((1L << k) - 1), k)
          i += 1
        }
      }
      idx += count
      p += 1
    }
  }

  // =====================================================================
  // SPI provider.
  // =====================================================================

  /** FLAC as a DEFAULT [[SampleDecoder.PcmDecoder]]: claims the fLaC
    * magic, decodes for real, normalizes to the chain's 16-bit signed
    * little-endian contract (narrower depths shift up, wider shift
    * down — the standard lossless-to-16 rendering). Malformed streams
    * decode to None and quarantine.
    */
  object FlacPcm extends SampleDecoder.PcmDecoder {
    def claims(payload: Array[Byte]): Boolean =
      payload != null && payload.length >= 42 &&
        payload(0) == 'f' && payload(1) == 'L' &&
        payload(2) == 'a' && payload(3) == 'C'
    def decode(payload: Array[Byte]): Option[AudioInputStream] =
      Flac.decode(payload).map { pcm =>
        val shift = pcm.bits - 16
        val bytes = new Array[Byte](pcm.samples.length * 2)
        var i = 0
        while (i < pcm.samples.length) {
          val v = if (shift >= 0) pcm.samples(i) >> shift
            else pcm.samples(i) << -shift
          bytes(2 * i) = (v & 0xff).toByte
          bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, pcm.rate.toFloat, 16,
          pcm.channels, 2 * pcm.channels, pcm.rate.toFloat, false)
        new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
          pcm.samples.length.toLong / pcm.channels)
      }
  }
}
