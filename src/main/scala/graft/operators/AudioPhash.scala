package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Perceptual AUDIO hashing over real decoded PCM — the audio-side
  * near-dup primitive, completing the modality triangle (text:
  * MinHash over shingles; image: dHash over block means; audio: the
  * energy-ENVELOPE hash here). Re-encoded, requantized, resampled, or
  * gain-adjusted copies of one recording survive as byte-distinct
  * blobs exact dedup can never fold, but their loudness envelope —
  * how energy moves through the clip — is the classic robust signal
  * (the public acoustic-fingerprint family of Haitsma & Kalker's
  * "A Highly Robust Audio Fingerprinting System", ISMIR 2002, reduced
  * to its time-domain energy form: band-energy DIFFERENCES quantized
  * to sign bits; here one broadband band, 65 temporal windows).
  *
  * [[envelopeHashOf]]: decode through the [[SampleDecoder.PcmDecoder]]
  * chain → mono mix → 65 equal FRACTIONAL windows over the clip → RMS
  * per window → 64 bits, bit i set iff window i+1 is strictly louder
  * than window i. Fractional windows make the hash duration- and
  * sample-rate-invariant (a resample keeps every window's span of the
  * signal); relative comparisons make it gain-invariant; and sign
  * quantization shrugs off requantization noise. Undecodable blobs
  * hash to None (the quarantine rule).
  *
  * Pairing rides the SAME block-combination kernel as the image side
  * ([[ImagePhash.hammingPairs]]) — one near-dup join contract across
  * modalities. Scale shape: one narrow decode map per blob, no
  * shuffle until the pair join.
  */
object AudioPhash {

  /** 64-bit envelope hash; None when no PCM provider claims/decodes
    * the payload or the stream has unknown/zero length.
    */
  def envelopeHashOf(b: Array[Byte],
      decoders: Seq[SampleDecoder.PcmDecoder] =
        SampleDecoder.pcmDefaults): Option[Long] = {
    if (b == null || b.length == 0) return None
    val in = SampleDecoder.decodePcm(b, decoders).orNull
    if (in == null) return None
    try {
      val f = in.getFormat
      val ch = f.getChannels
      val total = in.getFrameLength
      if (total <= 0 || total < 65) return None // need 65 non-empty windows
      val bytesPerFrame = 2 * ch
      val sumSq = new Array[Double](65)
      val nIn = new Array[Long](65)
      val buf = new Array[Byte](bytesPerFrame * 4096)
      var frame = 0L
      var n = in.read(buf)
      while (n > 0) {
        var off = 0
        while (off + bytesPerFrame <= n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val lo = buf(off + 2 * c) & 0xff
            val hi = buf(off + 2 * c + 1)
            acc += ((hi << 8) | lo).toShort.toDouble
            c += 1
          }
          val s = acc / ch / 32768.0
          // Fractional window: frame -> floor(frame * 65 / total), so
          // the same window spans the same SIGNAL region at any rate.
          val w = ((frame * 65L) / total).toInt
          val wi = if (w > 64) 64 else w
          sumSq(wi) += s * s
          nIn(wi) += 1
          frame += 1
          off += bytesPerFrame
        }
        n = in.read(buf)
      }
      var bits = 0L
      var i = 0
      while (i < 64) {
        val a = if (nIn(i) == 0) 0.0 else sumSq(i) / nIn(i)
        val b2 = if (nIn(i + 1) == 0) 0.0 else sumSq(i + 1) / nIn(i + 1)
        bits <<= 1
        if (b2 > a) bits |= 1L
        i += 1
      }
      Some(bits)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Column form — null for undecodable blobs (quarantine rule). */
  def audioEnvelopeHash(blob: Column): Column = {
    val f = udf { b: Array[Byte] => envelopeHashOf(b) }
    f(blob)
  }
}
