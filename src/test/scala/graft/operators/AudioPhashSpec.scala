package graft.operators

import graft.SparkSpec

class AudioPhashSpec extends SparkSpec {

  test("envelope hash: rising loudness sets bits, falling clears, " +
    "silence and garbage quarantine") {
    // Strictly rising 65-step staircase: every comparison brighter.
    def stair(up: Boolean): Array[Byte] = {
      val out = new Array[Short](65 * 200)
      for (w <- 0 until 65; j <- 0 until 200) {
        val a = 0.01 + 0.012 * (if (up) w else 64 - w)
        out(w * 200 + j) =
          (a * 32767 * math.sin(2 * math.Pi * 200 * j / 8000)).toShort
      }
      AudioFixtures.wavSamples(8000, out)
    }
    assert(AudioPhash.envelopeHashOf(stair(up = true)).contains(-1L))
    assert(AudioPhash.envelopeHashOf(stair(up = false)).contains(0L))
    // Constant amplitude: strict comparison -> no bits.
    val flat = AudioFixtures.wavSamples(8000,
      Array.tabulate[Short](65 * 200)(i =>
        (0.5 * 32767 * math.sin(2 * math.Pi * 200 * (i % 200) / 8000))
          .toShort))
    assert(AudioPhash.envelopeHashOf(flat).contains(0L))
    // Garbage / empty / too-short quarantine.
    assert(AudioPhash.envelopeHashOf(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(AudioPhash.envelopeHashOf(null).isEmpty)
    assert(AudioPhash.envelopeHashOf(
      AudioFixtures.wavSamples(8000, new Array[Short](10))).isEmpty)
  }

  test("hash is invariant to the real pipeline variants: 8-bit " +
    "requantize, 1.5x resample, gain+dither (within the 2 tie bits)") {
    val base = AudioPhash.envelopeHashOf(
      AudioFixtures.neardupWav(7L, 0)).get
    for (m <- 1 to 3) {
      val v = AudioPhash.envelopeHashOf(
        AudioFixtures.neardupWav(7L, m)).get
      val d = java.lang.Long.bitCount(base ^ v)
      assert(d <= 2, s"member $m drifted $d bits")
    }
  }

  test("neardupWav clusters: variants within 2 bits, cross-cluster " +
    "and far members far (the q191 contract)") {
    def eh(b: Array[Byte]): Long = AudioPhash.envelopeHashOf(b).get
    val clusters = 0L until 40L
    val hashes = clusters.map { c =>
      (0 until 4).map(m => eh(AudioFixtures.neardupWav(c, m)))
    }
    hashes.foreach { hs =>
      for (i <- hs.indices; j <- (i + 1) until hs.length) {
        val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
        assert(d <= 2, s"within-cluster dist $d > 2")
      }
    }
    for (a <- clusters.indices; b <- (a + 1) until clusters.length) {
      val d = java.lang.Long.bitCount(hashes(a).head ^ hashes(b).head)
      assert(d > 10, s"cross-cluster dist $d suspiciously low")
    }
    clusters.take(10).foreach { c =>
      val far = eh(AudioFixtures.neardupWav(c, 3, far = true))
      hashes.flatten.foreach { h =>
        assert(java.lang.Long.bitCount(far ^ h) > 10)
      }
    }
  }
}
