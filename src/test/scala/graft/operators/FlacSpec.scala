package graft.operators

import graft.SparkSpec

class FlacSpec extends SparkSpec {

  /** Deterministic multi-tone + ramp PCM: compressible (LPC/fixed have
    * something to predict) but not degenerate (no constant folds).
    */
  private def pcm(n: Int, channels: Int, bps: Int, seed: Int): Array[Int] = {
    val amp = (1 << (bps - 1)) - 1
    val out = new Array[Int](n * channels)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels) {
        val f = 0.013 * (1 + c) + 0.0007 * seed
        val v = 0.6 * math.sin(2 * math.Pi * f * i) +
          0.25 * math.sin(2 * math.Pi * f * 3.1 * i + seed) +
          0.05 * ((i * (seed + 7) * 2654435761L >>> 40).toInt % 97) / 97.0
        out(i * channels + c) =
          math.max(-amp - 1, math.min(amp, math.round(v * amp).toInt))
        c += 1
      }
      i += 1
    }
    out
  }

  private def roundTrip(x: Array[Int], ch: Int, rate: Int, bps: Int,
      bs: Int, pred: Flac.Predictor, st: Flac.Stereo, po: Int,
      esc: Boolean = false): Unit = {
    val enc = Flac.encode(x, ch, rate, bps, bs, pred, st, po, esc)
    val dec = Flac.decode(enc)
    assert(dec.isDefined, s"decode failed: ch=$ch bps=$bps bs=$bs $pred $st po=$po")
    val p = dec.get
    assert(p.rate == rate && p.channels == ch && p.bits == bps)
    assert(p.samples.sameElements(x),
      s"lossless violated: ch=$ch bps=$bps bs=$bs $pred $st po=$po")
  }

  test("round trip is the identity across predictors, stereo modes, " +
    "block sizes, partition orders, and bit depths") {
    val preds = Seq(Flac.Auto, Flac.VerbatimOnly, Flac.Fixed(0),
      Flac.Fixed(2), Flac.Fixed(4), Flac.Lpc(8))
    // Mono sweep: every predictor x block size x partition order.
    for (pred <- preds; bs <- Seq(192, 577, 1024); po <- Seq(0, 2, 4)) {
      val x = pcm(2500, 1, 16, seed = bs + po)
      roundTrip(x, 1, 8000, 16, bs, pred, Flac.Independent, po)
    }
    // Stereo decorrelation sweep: every mode x representative predictors.
    for (st <- Seq(Flac.Independent, Flac.LeftSide, Flac.RightSide,
        Flac.MidSide); pred <- Seq(Flac.Auto, Flac.Lpc(6))) {
      val x = pcm(3001, 2, 16, seed = 5)
      roundTrip(x, 2, 44100, 16, 1024, pred, st, po = 1)
    }
    // Bit depths (12/20 ride the "from STREAMINFO" bps-code path).
    for (bps <- Seq(8, 12, 16, 20, 24)) {
      val x = pcm(1800, 2, bps, seed = bps)
      roundTrip(x, 2, 16000, bps, 512, Flac.Auto, Flac.MidSide, po = 2)
    }
    // Beyond-stereo channel counts (independent only, per spec).
    for (ch <- Seq(3, 5, 8)) {
      val x = pcm(900, ch, 16, seed = ch)
      roundTrip(x, ch, 22050, 16, 256, Flac.Auto, Flac.Independent, po = 0)
    }
  }

  test("constant blocks, wasted bits, escape partitions, and a " +
    "single-sample tail block all survive the trip") {
    // Flat signal -> CONSTANT subframes.
    roundTrip(Array.fill(2048)(1234), 1, 8000, 16, 512,
      Flac.Auto, Flac.Independent, po = 0)
    // All-multiples-of-16 -> 4 wasted bits detected and restored.
    val w = pcm(2000, 1, 12, seed = 3).map(_ * 16)
    roundTrip(w, 1, 8000, 16, 512, Flac.Auto, Flac.Independent, po = 2)
    // Forced escape (raw verbatim) partitions, Rice2 method.
    roundTrip(pcm(1500, 2, 16, seed = 9), 2, 48000, 16, 500,
      Flac.Auto, Flac.LeftSide, po = 2, esc = true)
    // total = k*blockSize + 1: final frame is one sample.
    roundTrip(pcm(1025, 1, 16, seed = 2), 1, 8000, 16, 1024,
      Flac.Auto, Flac.Independent, po = 3)
    // Silence.
    roundTrip(new Array[Int](600), 1, 8000, 16, 256,
      Flac.Auto, Flac.Independent, po = 0)
  }

  test("corruption quarantines: every single-byte flip and every " +
    "truncation yields None or the original samples, never garbage") {
    val x = pcm(1200, 2, 16, seed = 11)
    val enc = Flac.encode(x, 2, 8000, 16, 512, Flac.Auto, Flac.MidSide, 1)
    // Byte-flip sweep over the whole stream. A flip in padding or an
    // unverified STREAMINFO field may still decode — then it must
    // decode to exactly the original samples; anything else is None.
    var i = 0
    while (i < enc.length) {
      val m = enc.clone()
      m(i) = (m(i) ^ 0x41).toByte
      Flac.decode(m) match {
        case Some(p) => assert(p.samples.sameElements(x),
          s"flip at $i decoded to DIFFERENT samples")
        case None => ()
      }
      i += 1
    }
    // Truncation sweep: STREAMINFO knows the total, so every proper
    // prefix must quarantine.
    for (len <- Seq(0, 3, 4, 20, 41, 42, enc.length / 2, enc.length - 1)) {
      assert(Flac.decode(java.util.Arrays.copyOf(enc, len)).isEmpty,
        s"truncated to $len did not quarantine")
    }
    assert(Flac.decode(null).isEmpty)
    assert(Flac.decode("fLaCnope".getBytes ++ new Array[Byte](40)).isEmpty)
  }

  test("decompression bomb quarantines: a huge declared total or an " +
    "over-budget unknown-total stream returns None, never allocates") {
    val x = new Array[Int](4096) // silence: CONSTANT frames, ~max ratio
    val enc = Flac.encode(x, 1, 8000, 16, 4096, Flac.Auto,
      Flac.Independent, 0)
    // Patch STREAMINFO totalSamples (the low 4 bits of byte 21 and
    // bytes 22..25) to 2^35 — a declared 128 GiB of PCM in a 60-byte
    // blob. The upfront guard must refuse before any frame allocates.
    val bomb = enc.clone()
    bomb(21) = ((bomb(21) & 0xf0) | 0x8).toByte // total[35:32] = 8
    assert(Flac.decode(bomb).isEmpty, "declared-total bomb must quarantine")
    // Unknown total (0): the running guard caps the frame loop.
    val unknown = enc.clone()
    unknown(21) = (unknown(21) & 0xf0).toByte
    java.util.Arrays.fill(unknown, 22, 26, 0.toByte)
    assert(Flac.decode(unknown, maxDecodedBytes = 1024).isEmpty,
      "over-budget unknown-total stream must quarantine")
    // And a legit stream decodes under a budget that fits it.
    assert(Flac.decode(enc, maxDecodedBytes = 4096L * 4).isDefined)
  }

  test("FlacPcm rides the SPI chain: claims the magic, decodes to the " +
    "16-bit LE contract, and AudioPhash hashes FLAC == WAV") {
    val n = 65 * 200
    val s16 = Array.tabulate[Short](n) { i =>
      val w = i / 200
      val a = 0.05 + 0.012 * (w % 30)
      (a * 32767 * math.sin(2 * math.Pi * 200 * (i % 200) / 8000)).toShort
    }
    val wav = AudioFixtures.wavSamples(8000, s16)
    val flac = Flac.encode(s16.map(_.toInt), 1, 8000, 16, 1024,
      Flac.Auto, Flac.Independent, 2)
    assert(Flac.FlacPcm.claims(flac) && !Flac.FlacPcm.claims(wav))
    // The default chain must route FLAC to FlacPcm (JavaSound has no
    // FLAC reader) and produce the identical envelope hash.
    val hw = AudioPhash.envelopeHashOf(wav)
    val hf = AudioPhash.envelopeHashOf(flac)
    assert(hw.isDefined && hw == hf,
      s"FLAC and WAV of the same PCM must hash identically: $hw vs $hf")
    // 24-bit FLAC normalizes to 16-bit on the chain (shift, not clamp).
    val x24 = s16.map(_.toInt << 8)
    val f24 = Flac.encode(x24, 1, 8000, 24, 1024, Flac.Lpc(4),
      Flac.Independent, 0)
    val h24 = AudioPhash.envelopeHashOf(f24)
    assert(h24 == hw, "24-bit FLAC must hash like its 16-bit rendering")
  }
}
