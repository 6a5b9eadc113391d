package graft.operators

import graft.SparkSpec

/** Header-only audio metadata: build∘parse identities over the audio
  * fixture family, cross-pinned against the JDK decoder where one
  * exists (WAV), plus quarantine behavior.
  */
class AudioContainerSpec extends SparkSpec {

  test("wav: fmt/data arithmetic gives exact duration; JDK decode agrees") {
    val b = AudioFixtures.wav(rate = 16000, channels = 2, nSamples = 8000)
    val m = AudioContainer.parse(b).get
    assert(m == AudioContainer.Meta("wav", 16000, 2, 500L, exact = true))
    // Cross-pin with the real decoder: the same blob through
    // javax.sound reports the same frame math.
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(b))
    assert(in.getFormat.getSampleRate.toInt == 16000)
    assert(in.getFrameLength == 8000L)
    in.close()
  }

  test("flac: STREAMINFO packs rate/channels/total; exact duration") {
    val b = AudioFixtures.flac(rate = 44100, channels = 2,
      totalSamples = 441000L)
    val m = AudioContainer.parse(b).get
    assert(m == AudioContainer.Meta("flac", 44100, 2, 10000L, exact = true))
    // Zero total samples = unknown length: duration 0, still parses.
    val unk = AudioFixtures.flac(48000, 1, 0L)
    assert(AudioContainer.parse(unk).get.durationMs == 0L)
  }

  test("mp3: first-frame header + CBR size estimate, flagged inexact") {
    // 128 kbps = 16000 bytes/s: 48000 bytes ~ 3000 ms.
    val b = AudioFixtures.mp3(kbps = 128, totalBytes = 48000)
    val m = AudioContainer.parse(b).get
    assert(m.format == "mp3" && m.sampleRate == 44100 && m.channels == 2)
    assert(m.durationMs == 3000L && !m.exact)
    val mono = AudioContainer.parse(
      AudioFixtures.mp3(192, 24000, stereo = false)).get
    assert(mono.channels == 1 && mono.durationMs == 1000L)
  }

  test("mp3: Xing/Info/VBRI frame counts give exact VBR duration") {
    // 1000 frames × 1152 samples / 44100 Hz = 26122 ms, exact.
    val xing = AudioContainer.parse(AudioFixtures.mp3Xing(1000L, 8192)).get
    assert(xing == AudioContainer.Meta("mp3", 44100, 2, 26122L, exact = true))
    // Mono shifts the side-info width (17 bytes) — the tag must still land.
    val mono = AudioContainer.parse(
      AudioFixtures.mp3Xing(441L, 4096, stereo = false)).get
    assert(mono.channels == 1 && mono.durationMs == 11520L && mono.exact)
    // LAME writes "Info" for CBR files; the frame count is just as exact.
    val info = AudioContainer.parse(
      AudioFixtures.mp3Xing(1000L, 8192, tag = "Info")).get
    assert(info.durationMs == 26122L && info.exact)
    // Fraunhofer VBRI: fixed offset 36, count at tag+14.
    val vbri = AudioContainer.parse(AudioFixtures.mp3Vbri(2205L, 8192)).get
    assert(vbri.durationMs == 57600L && vbri.exact)
  }

  test("mp3: corrupt or absent frame counts fall back to the CBR estimate") {
    // Flags without the frames bit: Xing present but count unusable.
    val noFrames = AudioFixtures.mp3Xing(1000L, 8192)
    noFrames(4 + 32 + 7) = 0 // clear the frames-present flag byte
    val nf = AudioContainer.parse(noFrames).get
    assert(!nf.exact && nf.durationMs == 8192L * 8000 / 128000)
    // Absurd wire count (>= 2^31): refuse the exact path, estimate instead.
    val absurd = AudioFixtures.mp3Xing((1L << 31) + 5, 8192)
    val ab = AudioContainer.parse(absurd).get
    assert(!ab.exact && ab.durationMs == 8192L * 8000 / 128000)
    // Zero frames: a count that proves nothing — estimate.
    val zero = AudioContainer.parse(AudioFixtures.mp3Xing(0L, 8192)).get
    assert(!zero.exact)
    // Truncated mid-header: never throws, still parses the frame header.
    val trunc = AudioFixtures.mp3Xing(1000L, 8192).take(4 + 32 + 6)
    val tr = AudioContainer.parse(trunc)
    assert(tr.forall(m => !m.exact))
  }

  test("ogg vorbis: ident header rate + terminal-page granule duration") {
    val b = AudioFixtures.oggVorbis(rate = 22050, channels = 1,
      granule = 44100L)
    val m = AudioContainer.parse(b).get
    assert(m == AudioContainer.Meta("ogg-vorbis", 22050, 1, 2000L,
      exact = true))
  }

  test("m4a: mvhd timescale/duration arithmetic") {
    val b = AudioFixtures.m4a(timescale = 600, duration = 1800L)
    val m = AudioContainer.parse(b).get
    assert(m.format == "m4a" && m.durationMs == 3000L && m.exact)
    // A VIDEO mp4 must refuse (it is not audio-only).
    assert(AudioContainer.parse(VideoFixtures.mp4(64, 48, 5, 6, 2)).isEmpty)
  }

  test("aiff: COMM chunk with 80-bit extended sample rate") {
    // Build a minimal AIFF: FORM/AIFF + COMM with rate 8000 encoded as
    // IEEE-754 extended (exp = 16395, mantissa = 8000 << 51).
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 18)
    out.put("FORM".getBytes).putInt(4 + 26).put("AIFF".getBytes)
    out.put("COMM".getBytes).putInt(18)
    out.putShort(1) // channels
    out.putInt(16000) // frames
    out.putShort(16) // bits
    val exp = 16383 + 12 // 8000 = 0b1111101000000, 13 bits -> 2^12 <= 8000
    out.putShort(exp.toShort)
    out.putLong(8000L << (63 - 12))
    val m = AudioContainer.parse(out.array()).get
    assert(m == AudioContainer.Meta("aiff", 8000, 1, 2000L, exact = true))
  }

  test("ogg terminal-page scan rejects payload false-positives and BOS/unset granules") {
    val good = AudioFixtures.oggVorbis(rate = 8000, channels = 1,
      granule = 16000L)
    // Trailing garbage containing a raw 'OggS' with an INVALID header
    // (version != 0) must not shadow the real terminal page.
    val decoy = good ++ "OggS".getBytes ++ Array.fill(30)(0x5a.toByte)
    assert(AudioContainer.parse(decoy).get.durationMs == 2000L)
    // Unset granule (-1) on the EOS page: with only the BOS page left
    // as a valid header, the parse must refuse (unknown duration), not
    // report the ident page's granule 0 as 0 ms exact.
    val unfinalized = good.clone()
    val eos = {
      var q = unfinalized.length - 27
      while (!(unfinalized(q) == 'O' && unfinalized(q + 1) == 'g' &&
        unfinalized(q + 2) == 'g' && unfinalized(q + 3) == 'S')) q -= 1
      q
    }
    java.util.Arrays.fill(unfinalized, eos + 6, eos + 14, 0xff.toByte)
    assert(AudioContainer.parse(unfinalized).isEmpty)
    // ...and MediaRouter still TAGS it audio (magic fallback).
    assert(MediaRouter.triage(unfinalized).get.format == "ogg-vorbis")
  }

  test("corrupt RIFF/AIFF chunk sizes end the walk instead of re-syncing") {
    val b = AudioFixtures.wav(8000, 1, 4000)
    // Blow up the fmt chunk size to ~2^31: the walk must terminate
    // (Long arithmetic) and the parse quarantine, not reinterpret
    // sample bytes as chunk headers.
    val c = b.clone()
    c(16) = 0xf8.toByte; c(17) = 0xff.toByte
    c(18) = 0xff.toByte; c(19) = 0x7f.toByte
    assert(AudioContainer.parse(c).isEmpty)
  }

  test("au: wire-value overflow quarantines instead of dividing by zero") {
    // rate=0x80000000 * ch=0x80000000 * bytesPer=4 wraps Long to
    // exactly 0 — the division threw ArithmeticException inside the
    // audioMeta UDF before the plausibility bounds landed.
    def au(rate: Long, ch: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(32)
      b.put(".snd".getBytes).putInt(24).putInt(8000) // offset, dataSize
      b.putInt(5).putInt(rate.toInt).putInt(ch.toInt) // float32 enc
      b.array()
    }
    assert(AudioContainer.parse(au(0x80000000L, 0x80000000L)).isEmpty)
    assert(AudioContainer.parse(au(0xfffffff0L, 3L)).isEmpty) // negative garbage
    assert(AudioContainer.parse(au(0x100000L, 1L)).isEmpty) // above ceiling
    val ok = AudioContainer.parse(au(8000L, 2L)).get // still parses sane input
    assert(ok == AudioContainer.Meta("au", 8000, 2, 125L, exact = true))
  }

  test("ogg: corrupt terminal granule past the ceiling quarantines, not negative-exact") {
    val good = AudioFixtures.oggVorbis(rate = 8000, channels = 1,
      granule = 16000L)
    val eos = {
      var q = good.length - 27
      while (!(good(q) == 'O' && good(q + 1) == 'g' && good(q + 2) == 'g' &&
        good(q + 3) == 'S')) q -= 1
      q
    }
    // granule = 2^62: passes g >= 0, but granule*1000 overflows Long —
    // a negative duration_ms flagged exact=true before the ceiling.
    val corrupt = good.clone()
    java.util.Arrays.fill(corrupt, eos + 6, eos + 14, 0.toByte)
    corrupt(eos + 13) = 0x40.toByte // LE byte 7 -> 2^62
    assert(AudioContainer.parse(corrupt).isEmpty)
  }

  test("quarantine: garbage, truncation, video containers, null") {
    assert(AudioContainer.parse(null).isEmpty)
    assert(AudioContainer.parse("not audio at all".getBytes).isEmpty)
    assert(AudioContainer.parse(VideoFixtures.mkv(32, 24, 5, 3, 1)).isEmpty)
    val flac = AudioFixtures.flac(44100, 2, 1000L)
    (1 until flac.length by 7).foreach { cut =>
      AudioContainer.parse(java.util.Arrays.copyOf(flac, cut)) // no throw
    }
    // An 0xFF-leading blob with reserved MPEG fields refuses.
    val bad = Array(0xff, 0xfb, 0xf0, 0).map(_.toByte) ++ new Array[Byte](64)
    assert(AudioContainer.parse(bad).isEmpty)
  }

  test("MediaRouter triage carries the parsed audio duration") {
    val t = MediaRouter.triage(AudioFixtures.wav(8000, 1, 4000)).get
    assert(t.kind == "audio" && t.format == "wav" &&
      t.durationMs.contains(500L))
    val t2 = MediaRouter.triage(AudioFixtures.m4a(1000, 2500L)).get
    assert(t2.format == "m4a" && t2.durationMs.contains(2500L))
  }
}
