package graft.operators

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream}

/** Wild-WAV codec coverage: IMA ADPCM (WAVE format tag 0x0011) decoded
  * from the public IMA/DVI spec, plus G.711 µ-law/A-law ENCODERS for
  * fixtures (tags 0x0007/0x0006 — the JDK's javax.sound decodes those
  * two, so they ride [[SampleDecoder.JavaSoundPcm]]; it ships no IMA
  * ADPCM codec, so [[AdpcmPcm]] closes that hole as a DEFAULT
  * provider). Telephony dumps and game/voice corpora are full of all
  * three — they are the most common non-PCM WAVs a 100 TB crawl
  * actually contains.
  *
  * IMA ADPCM layout (Microsoft WAVE + IMA ADPCM reference): data is a
  * sequence of independent BLOCKS of `nBlockAlign` bytes; each block
  * opens with a 4-byte per-channel header (predictor s16le, step
  * index u8, reserved u8) carrying the block's FIRST sample, followed
  * by 4-bit deltas, low nibble first — stereo alternates 4-byte
  * (8-nibble) groups per channel. Each nibble steps the shared
  * predictor/step-index state machine ([[stepTable]]/[[indexTable]]).
  * Blocks are self-contained, so a truncated tail keeps its good
  * prefix of whole blocks (the engine-wide dirty-input posture) and a
  * 100 TB scan could even decode blocks independently.
  *
  * The encoder is the standard greedy quantizer (same tables, same
  * state walk), used by specs/gates to prove decode tracks encode
  * within ADPCM's designed error envelope — ADPCM is lossy, so the
  * contract is a bounded error, not identity (that is FLAC's, q192).
  */
object Adpcm {

  private[operators] val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[operators] val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA state machine step: decode nibble `n` against (pred,
    * index), returning the new (pred, index). Shared verbatim by the
    * encoder, so both sides walk the identical state.
    */
  @inline private def step(pred: Int, index: Int, n: Int): (Int, Int) = {
    val st = stepTable(index)
    var diff = st >> 3
    if ((n & 4) != 0) diff += st
    if ((n & 2) != 0) diff += st >> 1
    if ((n & 1) != 0) diff += st >> 2
    val p0 = if ((n & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + indexTable(n & 7)))
    (p, i)
  }

  /** Greedy IMA quantizer for one sample against (pred, index):
    * returns (nibble, newPred, newIndex).
    */
  @inline private def quantize(pred: Int, index: Int,
      sample: Int): (Int, Int, Int) = {
    val st = stepTable(index)
    var delta = sample - pred
    var n = 0
    if (delta < 0) { n = 8; delta = -delta }
    if (delta >= st) { n |= 4; delta -= st }
    if (delta >= (st >> 1)) { n |= 2; delta -= st >> 1 }
    if (delta >= (st >> 2)) n |= 1
    val (p, i) = step(pred, index, n)
    (n, p, i)
  }

  /** Samples per block per channel for a block of `blockAlign` bytes:
    * the header sample plus two nibbles per remaining data byte,
    * split across channels.
    */
  def samplesPerBlock(blockAlign: Int, channels: Int): Int =
    1 + (blockAlign - 4 * channels) * 2 / channels

  // ---- WAV containers ------------------------------------------------

  private def wavHeader(w: VideoFixtures.W, tag: Int, rate: Int,
      channels: Int, bits: Int, blockAlign: Int, byteRate: Long,
      dataBytes: Int, extra: Array[Byte]): Unit = {
    val fmtLen = 16 + (if (extra.nonEmpty) 2 + extra.length else 0)
    w.cc("RIFF").u32le(4L + 8 + fmtLen + 8 + dataBytes).cc("WAVE")
    w.cc("fmt ").u32le(fmtLen.toLong)
      .u16le(tag).u16le(channels).u32le(rate.toLong)
      .u32le(byteRate).u16le(blockAlign).u16le(bits)
    if (extra.nonEmpty) { w.u16le(extra.length); w.bytes(extra) }
    w.cc("data").u32le(dataBytes.toLong)
  }

  /** IMA ADPCM WAV (tag 0x0011) from interleaved 16-bit samples.
    * Emits WHOLE blocks only: the sample count must be a multiple of
    * [[samplesPerBlock]] (fixture-grade strictness; real files may
    * carry a short tail block, which [[decode]] handles).
    */
  def encodeImaWav(samples: Array[Int], channels: Int, rate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    require(channels == 1 || channels == 2, "IMA ADPCM: mono or stereo")
    require(blockAlign >= 4 * channels + 4 * channels &&
      blockAlign % (4 * channels) == 0, s"bad blockAlign $blockAlign")
    require(samples.length % channels == 0, "ragged interleave")
    val spb = samplesPerBlock(blockAlign, channels)
    val total = samples.length / channels
    require(total % spb == 0, s"fixture encoder wants whole blocks: " +
      s"$total % $spb != 0")
    val nBlocks = total / spb
    val data = new Array[Byte](nBlocks * blockAlign)
    val pred = new Array[Int](channels)
    val index = new Array[Int](channels)
    var b = 0
    while (b < nBlocks) {
      val base = b * blockAlign
      val s0 = b * spb
      var c = 0
      while (c < channels) {
        // Block header: the channel's first sample verbatim, plus a
        // per-block INITIAL step index chosen to match the block's
        // opening delta (the header carries the index explicitly, so
        // this is free conformance — and it is what real encoders do;
        // starting every block at the carried-over index makes the
        // cold-start attack error enormous when the signal moves
        // thousands of units per sample while the step is still 7).
        pred(c) = samples(s0 * channels + c)
        if (spb > 1) {
          val d0 = math.abs(samples((s0 + 1) * channels + c) - pred(c))
          var ix = 0
          while (ix < 88 && stepTable(ix) < d0) ix += 1
          index(c) = ix
        }
        data(base + 4 * c) = (pred(c) & 0xff).toByte
        data(base + 4 * c + 1) = ((pred(c) >> 8) & 0xff).toByte
        data(base + 4 * c + 2) = index(c).toByte
        c += 1
      }
      // Nibbles in 4-byte groups alternating channels.
      var k = 1 // sample index within block (0 was the header)
      var off = base + 4 * channels
      while (k < spb) {
        var c2 = 0
        while (c2 < channels) {
          var g = 0
          while (g < 8) { // 8 nibbles = one 4-byte group per channel
            val s = k + g
            val nib = if (s < spb) {
              val (n, p, i) = quantize(pred(c2), index(c2),
                samples((s0 + s) * channels + c2))
              pred(c2) = p; index(c2) = i; n
            } else 0
            val byteAt = off + (g >> 1)
            if ((g & 1) == 0) data(byteAt) = (nib & 0xf).toByte
            else data(byteAt) = (data(byteAt) | ((nib & 0xf) << 4)).toByte
            g += 1
          }
          off += 4
          c2 += 1
        }
        k += 8
      }
      b += 1
    }
    val w = new VideoFixtures.W
    val byteRate = rate.toLong * blockAlign / spb
    val extra = Array[Byte]((spb & 0xff).toByte, ((spb >> 8) & 0xff).toByte)
    wavHeader(w, 0x11, rate, channels, 4, blockAlign, byteRate,
      data.length, extra)
    w.bytes(data)
    w.result()
  }

  /** Decoded interleaved 16-bit samples from an IMA ADPCM WAV, or None
    * on anything malformed (quarantine). A truncated final block
    * decodes its available whole bytes (dirty-input posture).
    */
  def decode(b: Array[Byte]): Option[Pcm16] =
    try decodeStrict(b) catch { case scala.util.control.NonFatal(_) => None }

  final case class Pcm16(rate: Int, channels: Int, samples: Array[Int])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u16le(b, i).toLong) | (u16le(b, i + 2).toLong << 16)
  private def cc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def decodeStrict(b: Array[Byte]): Option[Pcm16] = {
    if (b == null || b.length < 44) return None
    if (cc(b, 0) != "RIFF" || cc(b, 8) != "WAVE") return None
    var i = 12L
    var tag = 0; var ch = 0; var rate = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val typ = cc(b, i.toInt)
      val sz = u32le(b, i.toInt + 4)
      if (typ == "fmt " && i + 8 + 16 <= b.length) {
        tag = u16le(b, i.toInt + 8)
        ch = u16le(b, i.toInt + 10)
        rate = u32le(b, i.toInt + 12).toInt
        blockAlign = u16le(b, i.toInt + 20)
      } else if (typ == "data") {
        dataOff = (i + 8).toInt
        dataLen = math.min(sz, b.length - i - 8).toInt
      }
      i += 8 + sz + (sz & 1L)
    }
    if (tag != 0x11 || (ch != 1 && ch != 2) || rate <= 0 ||
      blockAlign < 8 * ch || blockAlign % (4 * ch) != 0 ||
      dataOff < 0 || dataLen < 4 * ch) return None
    val spb = samplesPerBlock(blockAlign, ch)
    val out = Vector.newBuilder[Int]
    var base = dataOff
    val end = dataOff + dataLen
    while (base + 4 * ch <= end) {
      val blockEnd = math.min(base + blockAlign, end)
      val pred = new Array[Int](ch)
      val index = new Array[Int](ch)
      var badBlock = false
      var c = 0
      while (c < ch) {
        pred(c) = u16le(b, base + 4 * c).toShort.toInt
        index(c) = b(base + 4 * c + 2) & 0xff
        // A step index past the table is corruption — but blocks are
        // SELF-CONTAINED, so one bad block skips, it does not discard
        // every good block already decoded (the dirty-input posture;
        // mainstream decoders behave the same). The 4th header byte
        // is reserved: wild encoders put values there, ignore it.
        if (index(c) > 88) badBlock = true
        c += 1
      }
      if (!badBlock) {
        // First sample per channel is the header predictor.
        val block = Array.ofDim[Int](ch, spb)
        c = 0
        while (c < ch) { block(c)(0) = pred(c); c += 1 }
        var k = 1
        var off = base + 4 * ch
        var truncatedAt = spb
        while (k < spb && truncatedAt == spb) {
          var c2 = 0
          while (c2 < ch) {
            var g = 0
            while (g < 8) {
              val s = k + g
              val byteAt = off + (g >> 1)
              if (s < spb) {
                if (byteAt < blockEnd) {
                  val nib = if ((g & 1) == 0) b(byteAt) & 0xf
                    else (b(byteAt) >> 4) & 0xf
                  val (p, ix) = step(pred(c2), index(c2), nib)
                  pred(c2) = p; index(c2) = ix
                  block(c2)(s) = p
                } else if (truncatedAt == spb) {
                  // Truncated tail: clamp to the GROUP start — a later
                  // channel's group for these samples never decoded,
                  // so emitting past k would fabricate zero samples
                  // in that channel.
                  truncatedAt = k
                }
              }
              g += 1
            }
            off += 4
            c2 += 1
          }
          k += 8
        }
        val have = truncatedAt
        var s = 0
        while (s < have) {
          var c3 = 0
          while (c3 < ch) { out += block(c3)(s); c3 += 1 }
          s += 1
        }
      }
      base += blockAlign
    }
    val samples = out.result().toArray
    if (samples.isEmpty) None else Some(Pcm16(rate, ch, samples))
  }

  /** IMA ADPCM as a DEFAULT [[SampleDecoder.PcmDecoder]]: claims
    * RIFF/WAVE whose fmt tag is 0x0011 (the JDK's javax.sound reader
    * rejects those), emits the chain's 16-bit signed LE contract.
    */
  object AdpcmPcm extends SampleDecoder.PcmDecoder {
    def claims(payload: Array[Byte]): Boolean = {
      if (payload == null || payload.length < 44) return false
      if (cc(payload, 0) != "RIFF" || cc(payload, 8) != "WAVE") return false
      // Find the fmt tag without a full parse.
      var i = 12L
      while (i + 8 <= payload.length) {
        if (cc(payload, i.toInt) == "fmt ")
          return i + 10 <= payload.length && u16le(payload, i.toInt + 8) == 0x11
        i += 8 + u32le(payload, i.toInt + 4) + (u32le(payload, i.toInt + 4) & 1L)
      }
      false
    }
    def decode(payload: Array[Byte]): Option[AudioInputStream] =
      Adpcm.decode(payload).map { pcm =>
        val bytes = new Array[Byte](pcm.samples.length * 2)
        var i = 0
        while (i < pcm.samples.length) {
          bytes(2 * i) = (pcm.samples(i) & 0xff).toByte
          bytes(2 * i + 1) = ((pcm.samples(i) >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED, pcm.rate.toFloat, 16,
          pcm.channels, 2 * pcm.channels, pcm.rate.toFloat, false)
        new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
          pcm.samples.length.toLong / pcm.channels)
      }
  }

  // ---- G.711 (fixture encoders; javax.sound decodes) ------------------

  private def segment(v: Int, ends: Array[Int]): Int = {
    var s = 0
    while (s < ends.length && v > ends(s)) s += 1
    s
  }
  private val UlawSegEnds =
    Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff)
  private val AlawSegEnds =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** Linear 16-bit → µ-law byte: the canonical segmented form of the
    * G.711 tables (14-bit domain, bias 33, complemented output).
    */
  def linearToUlaw(s: Int): Int = {
    var pcm = s >> 2 // 16-bit fixture domain -> G.711's 14-bit
    val mask = if (pcm < 0) { pcm = -pcm; 0x7f } else 0xff
    if (pcm > 8158) pcm = 8158
    pcm += 33
    val seg = segment(pcm, UlawSegEnds)
    if (seg >= 8) 0x7f ^ mask
    else (((seg << 4) | ((pcm >> (seg + 1)) & 0x0f)) ^ mask) & 0xff
  }

  /** Linear 16-bit → A-law byte: the canonical segmented form (13-bit
    * domain, 0x55 alternation).
    */
  def linearToAlaw(s: Int): Int = {
    var pcm = s >> 3 // 16-bit fixture domain -> G.711's 13-bit
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 1; 0x55 }
    val seg = segment(pcm, AlawSegEnds)
    if (seg >= 8) 0x7f ^ mask
    else {
      val aval = (seg << 4) |
        (if (seg < 2) (pcm >> 1) & 0x0f else (pcm >> seg) & 0x0f)
      (aval ^ mask) & 0xff
    }
  }

  /** G.711 WAV: tag 7 (µ-law) / tag 6 (A-law), 8 bits per sample. */
  def encodeG711Wav(samples: Array[Int], channels: Int, rate: Int,
      alaw: Boolean): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    val data = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) {
      data(i) = (if (alaw) linearToAlaw(samples(i))
        else linearToUlaw(samples(i))).toByte
      i += 1
    }
    val w = new VideoFixtures.W
    wavHeader(w, if (alaw) 6 else 7, rate, channels, 8, channels,
      rate.toLong * channels, data.length, Array(0, 0))
    w.bytes(data)
    w.result()
  }
}
