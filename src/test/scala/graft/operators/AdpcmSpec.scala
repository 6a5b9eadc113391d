package graft.operators

import graft.SparkSpec

class AdpcmSpec extends SparkSpec {

  private def tone(n: Int, channels: Int, amp: Double = 0.4): Array[Int] = {
    val out = new Array[Int](n * channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) {
        val v = amp * math.sin(2 * math.Pi * 0.02 * (1 + c) * i) +
          0.1 * amp * math.sin(2 * math.Pi * 0.077 * i)
        out(i * channels + c) = math.round(v * 32767).toInt
        c += 1
      }
      i += 1
    }
    out
  }

  private def maxErr(a: Array[Int], b: Array[Int]): Int = {
    require(a.length == b.length, s"${a.length} != ${b.length}")
    var m = 0
    var i = 0
    while (i < a.length) { m = math.max(m, math.abs(a(i) - b(i))); i += 1 }
    m
  }

  test("IMA ADPCM round trip stays inside the codec's error envelope, " +
    "mono and stereo, and the state machine's first sample is exact") {
    for (ch <- Seq(1, 2)) {
      val spb = Adpcm.samplesPerBlock(256, ch)
      val x = tone(spb * 5, ch)
      val wav = Adpcm.encodeImaWav(x, ch, 8000, blockAlign = 256)
      val got = Adpcm.decode(wav).get
      assert(got.rate == 8000 && got.channels == ch)
      assert(got.samples.length == x.length)
      // Block headers carry the first sample verbatim.
      for (c <- 0 until ch) assert(got.samples(c) == x(c))
      // ADPCM tracks a smooth tone tightly once the step adapts: the
      // worst step in the table quantizes to ~step/8; for this tone
      // the observed envelope is well under 2% of full scale.
      val err = maxErr(got.samples, x)
      assert(err <= 655, s"ch=$ch max err $err > 1%% FS")
    }
  }

  test("IMA nibble state machine: hand-stepped vectors") {
    // From (pred=0, index=0, step=7): nibble 3 -> diff = 7/8 + 7/2 +
    // 7/4 = 0+3+1 = 4 (integer), pred=4, index += indexTable(3) = -1
    // -> clamp 0. Next nibble 8 (sign only): diff = step/8 = 0,
    // pred stays 4, index -1 -> 0.
    val x = Array(4, 4) ++ Array.fill(503)(4)
    val spb = Adpcm.samplesPerBlock(256, 1) // 505
    val enc = Adpcm.encodeImaWav(Array.fill(spb)(0) ++ x.take(0) ++
      Array.fill(0)(0), 1, 8000) // all-zero block: nibbles all 0
    val dec = Adpcm.decode(enc).get
    assert(dec.samples.forall(_ == 0), "silence must decode to silence")
    // Greedy quantizer inverse: encode a signal that IS reachable by
    // the state walk and the decode must match it exactly for the
    // first steps (4 is exactly nibble 3 from the initial state).
    val reach = Array.fill(spb)(0)
    reach(1) = 4
    val enc2 = Adpcm.encodeImaWav(reach, 1, 8000)
    val dec2 = Adpcm.decode(enc2).get
    assert(dec2.samples(0) == 0 && dec2.samples(1) == 4,
      s"hand vector broke: got ${dec2.samples.take(3).mkString(",")}")
  }

  test("quarantine + dirty-input posture: garbage, wrong tags, " +
    "truncated tails keep whole-block prefixes") {
    assert(Adpcm.decode(null).isEmpty)
    assert(Adpcm.decode(Array[Byte](1, 2, 3)).isEmpty)
    // A PCM wav (tag 1) must NOT decode as ADPCM and must not claim.
    val pcm = AudioFixtures.wavSamples(8000, new Array[Short](100))
    assert(Adpcm.decode(pcm).isEmpty && !Adpcm.AdpcmPcm.claims(pcm))
    // Truncation: cut mid-block -> the good prefix of whole samples
    // survives, never garbage.
    val spb = Adpcm.samplesPerBlock(256, 1)
    val x = tone(spb * 3, 1)
    val wav = Adpcm.encodeImaWav(x, 1, 8000)
    val cut = java.util.Arrays.copyOf(wav, wav.length - 100)
    val dec = Adpcm.decode(cut)
    assert(dec.isDefined, "truncated tail must keep its good prefix")
    val n = dec.get.samples.length
    assert(n > spb * 2 && n < spb * 3)
    assert(maxErr(dec.get.samples, x.take(n)) <= 655)
    // Corrupt step index (> 88) skips exactly that SELF-CONTAINED
    // block; the other blocks survive (data starts at 48: RIFF(12) +
    // fmt chunk(8 + 16 + 2 + 2 extension) + data header(8)).
    val bad = wav.clone()
    bad(48 + 2) = 99.toByte // first block header's index byte
    val badDec = Adpcm.decode(bad).get
    assert(badDec.samples.length == spb * 2,
      s"bad block must skip, got ${badDec.samples.length}")
    assert(maxErr(badDec.samples, x.drop(spb)) <= 655,
      "surviving blocks must decode exactly as before")
    // The 4th header byte is reserved — wild encoders set it; a
    // decoder must ignore it, not quarantine.
    val res = wav.clone()
    res(48 + 3) = 7.toByte
    assert(Adpcm.decode(res).get.samples.length == spb * 3)
  }

  test("G.711 u-law/A-law fixtures decode through the JDK chain " +
    "within G.711's quantization envelope; ADPCM rides the SPI") {
    val x = tone(2000, 1)
    def decodeVia(b: Array[Byte]): Array[Int] = {
      val in = SampleDecoder.decodePcm(b).get
      try {
        val bytes = in.readAllBytes()
        Array.tabulate(bytes.length / 2)(i =>
          ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)))
      } finally in.close()
    }
    val viaU = decodeVia(Adpcm.encodeG711Wav(x, 1, 8000, alaw = false))
    val viaA = decodeVia(Adpcm.encodeG711Wav(x, 1, 8000, alaw = true))
    // G.711 top-segment quantization interval is 256 (u-law, 16-bit
    // scale) / 512 (A-law bottom bits of top segment on 13-bit x8):
    // half-interval rounding puts the worst error near 256/512 + the
    // JDK decoder's midpoint convention.
    assert(maxErr(viaU, x) <= 512, s"ulaw err ${maxErr(viaU, x)}")
    assert(maxErr(viaA, x) <= 1024, s"alaw err ${maxErr(viaA, x)}")
    // ADPCM claims its tag and rides the same chain.
    val spb = Adpcm.samplesPerBlock(256, 1)
    val xa = tone(spb * 2, 1)
    val adpcm = Adpcm.encodeImaWav(xa, 1, 8000)
    assert(Adpcm.AdpcmPcm.claims(adpcm))
    assert(maxErr(decodeVia(adpcm), xa) <= 655)
  }
}
