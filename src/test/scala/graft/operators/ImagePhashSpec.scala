package graft.operators

import graft.SparkSpec

class ImagePhashSpec extends SparkSpec {

  private def bmpOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
      try { w.setOutput(ios); w.write(img) } finally w.dispose()
    } finally ios.close()
    out.toByteArray
  }

  private def img(w: Int, h: Int)(f: (Int, Int) => Int) = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val t = f(x, y) & 0xff
      im.setRGB(x, y, (t << 16) | (t << 8) | t)
    }
    im
  }

  test("dhash/vhash of exact (lossless BMP) gradients hit the sign bits") {
    // Horizontal ascending: every right neighbor brighter -> dhash
    // all ones; vertical ties -> vhash zero (strict comparison).
    val horiz = bmpOf(img(90, 80)((x, _) => x * 255 / 89))
    assert(ImagePhash.dhashOf(horiz).contains(-1L)) // 64 ones
    assert(ImagePhash.vhashOf(horiz).contains(0L))
    // Vertical ascending: the transpose.
    val vert = bmpOf(img(80, 90)((_, y) => y * 255 / 89))
    assert(ImagePhash.dhashOf(vert).contains(0L))
    assert(ImagePhash.vhashOf(vert).contains(-1L))
    // Solid: all ties, both zero.
    val solid = bmpOf(img(40, 40)((_, _) => 128))
    assert(ImagePhash.dhashOf(solid).contains(0L))
    assert(ImagePhash.vhashOf(solid).contains(0L))
  }

  test("hash is robust to JPEG re-encode and resize of the same scene") {
    val a = VideoFixtures.gradientJpeg(120, 96, ascending = true)
    val b = VideoFixtures.gradientJpeg(60, 48, ascending = true) // resized
    val (ha, hb) = (ImagePhash.dhashOf(a).get, ImagePhash.dhashOf(b).get)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3,
      "re-encoded/resized copy drifted past the near-dup band")
    val desc = ImagePhash.dhashOf(
      VideoFixtures.gradientJpeg(120, 96, ascending = false)).get
    assert(java.lang.Long.bitCount(ha ^ desc) >= 32,
      "opposite scene should be far")
  }

  test("undecodable blobs hash to None") {
    assert(ImagePhash.dhashOf(null).isEmpty)
    assert(ImagePhash.dhashOf(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImagePhash.vhashOf("not an image".getBytes).isEmpty)
  }

  test("bandedHammingPairs: pigeonhole finds every pair within maxDist") {
    import spark.implicits._
    // Class hashes replicated across bands (distance 0 within class),
    // plus one near pair at distance 3 concentrated in ONE band (the
    // pigeonhole case a naive all-bands-must-match join would drop),
    // and one pair at distance 4 that must be filtered.
    val base = 5L * 0x0001000100010001L
    val rows = Seq(
      (1L, base), (2L, base), // dist 0
      (3L, base ^ 0x7L), // dist 3 from 1/2, shares 3 bands
      (4L, base ^ 0x0001000100010001L), // 4 bits, one per band
      (10L, 9L * 0x0001000100010001L), (11L, 9L * 0x0001000100010001L))
    val df = rows.toDF("id", "h")
    val got = ImagePhash.bandedHammingPairs(df, "id", "h", maxDist = 3)
      .select($"ida", $"idb", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 3), (2L, 3L, 3), (10L, 11L, 0)))
  }

  test("bandedHammingPairs refuses a guarantee-breaking maxDist") {
    import spark.implicits._
    val df = Seq((1L, 0L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      ImagePhash.bandedHammingPairs(df, "id", "h", maxDist = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      ImagePhash.bandedHammingPairs(df, "id", "h", maxDist = 1, bands = 5)
    }
  }

  test("hammingPairs (block combinations) matches brute force exactly") {
    import spark.implicits._
    // Structured + adversarial hashes: identical, 1..5-bit flips at
    // block boundaries (bits 10/11, 21, 31/32, 42, 53 straddle the
    // 6-block edges), plus random-ish values.
    val rnd = new scala.util.Random(42)
    val hs = (Seq(0L, 1L, 3L, 1L << 10, 1L << 11, (1L << 10) | (1L << 11),
      -1L, -2L, 0x5555555555555555L, 0x5555555555545555L) ++
      (0 until 40).map(_ => rnd.nextLong())).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val df = hs.toDF("id", "h")
    for (maxDist <- Seq(0, 1, 3, 5); blocks <- Seq(6, 8)) {
      if (maxDist < blocks) {
        val got = ImagePhash.hammingPairs(df, "id", "h", maxDist, blocks)
          .as[(Long, Long, Int)].collect().toSet
        val want = (for {
          (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
          d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
        } yield (ia, ib, d)).toSet
        assert(got == want, s"maxDist=$maxDist blocks=$blocks")
      }
    }
  }

  test("neardupJpeg clusters: real variants stay within 2 bits, " +
    "cross-cluster and far members stay far (the q188 contract)") {
    def dh(b: Array[Byte]): Long = ImagePhash.dhashOf(b).get
    val clusters = 0L until 40L
    val hashes = clusters.map { c =>
      (0 until 4).map(m => dh(VideoFixtures.neardupJpeg(c, m)))
    }
    // Within-cluster: every variant pair within the 2 designed tie bits.
    hashes.foreach { hs =>
      for (i <- hs.indices; j <- (i + 1) until hs.length) {
        val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
        assert(d <= 2, s"within-cluster dist $d > 2")
      }
    }
    // Cross-cluster: far beyond the gate's maxDist = 3.
    for (a <- clusters.indices; b <- (a + 1) until clusters.length) {
      val d = java.lang.Long.bitCount(hashes(a).head ^ hashes(b).head)
      assert(d > 10, s"cross-cluster dist $d suspiciously low")
    }
    // The far singleton pairs with NOTHING — not its own cluster, not
    // any other cluster's base.
    clusters.take(10).foreach { c =>
      val far = dh(VideoFixtures.neardupJpeg(c, 3, far = true))
      hashes.flatten.foreach { h =>
        assert(java.lang.Long.bitCount(far ^ h) > 10)
      }
    }
  }
}
