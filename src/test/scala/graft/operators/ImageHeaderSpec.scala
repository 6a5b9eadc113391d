package graft.operators

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Header parsing over REAL encoder output: the JDK's own PNG/JPEG/
  * GIF/BMP writers produce the bytes (no checked-in binaries, no
  * external libs), the parser reads back the geometry it encoded.
  */
class ImageHeaderSpec extends SparkSpec {

  private def img(fmt: String, w: Int, h: Int,
      imgType: Int = BufferedImage.TYPE_3BYTE_BGR): Array[Byte] = {
    val img = new BufferedImage(w, h, imgType)
    // Non-constant pixels so encoders can't degenerate-case the stream.
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  test("PNG/JPEG/GIF/BMP headers round-trip through the JDK encoders") {
    val cases = Seq(
      ("png", 37, 21), ("jpg", 64, 48), ("gif", 13, 7), ("bmp", 24, 36))
    for ((fmt, w, h) <- cases) {
      val m = ImageHeader.parse(img(fmt, w, h))
        .getOrElse(fail(s"$fmt: parse returned None"))
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(m.format == want && m.width == w && m.height == h,
        s"$fmt: got $m")
      assert(m.channels == 3, s"$fmt: 3-channel source, got ${m.channels}")
    }
    // Channel variants: greyscale PNG and RGBA PNG.
    val grey = ImageHeader.parse(
      img("png", 10, 10, BufferedImage.TYPE_BYTE_GRAY)).get
    assert(grey.channels == 1, s"grey png: $grey")
    val rgba = ImageHeader.parse(
      img("png", 10, 10, BufferedImage.TYPE_INT_ARGB)).get
    assert(rgba.channels == 4, s"rgba png: $rgba")
  }

  test("TIFF headers round-trip through the JDK encoder (both byte orders via parse)") {
    // JDK 9+ ships a TIFF ImageIO plugin; its output is the real-world
    // little-endian layout. Big-endian is hand-built below.
    val m = ImageHeader.parse(img("tiff", 41, 27))
      .getOrElse(fail("tiff: parse returned None"))
    assert(m.format == "tiff" && m.width == 41 && m.height == 27, s"$m")
    // Hand-built big-endian: header + one IFD with 256/257/277.
    val be = java.nio.ByteBuffer.allocate(8 + 2 + 3 * 12 + 4)
    be.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    be.putShort(3)
    def entryBE(tag: Int, v: Int): Unit = {
      be.putShort(tag.toShort).putShort(3) // SHORT
      be.putInt(1)
      be.putShort(v.toShort).putShort(0) // left-justified inline value
    }
    entryBE(256, 123); entryBE(257, 45); entryBE(277, 4)
    be.putInt(0) // next-IFD terminator
    val mb = ImageHeader.parse(be.array()).get
    assert(mb.width == 123 && mb.height == 45 && mb.channels == 4, s"$mb")
  }

  test("WebP: all three first-chunk layouts parse; corrupt signatures refuse") {
    def riff(cc: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(12 + payload.length)
        .put("WEBP".getBytes).put(cc.getBytes).putInt(payload.length)
        .put(payload)
      bb.array()
    }
    // VP8 lossy: 3-byte frame tag, start code, 14-bit LE dims.
    val vp8 = new Array[Byte](10)
    vp8(3) = 0x9d.toByte; vp8(4) = 0x01; vp8(5) = 0x2a
    vp8(6) = (320 & 0xff).toByte; vp8(7) = (320 >> 8).toByte
    vp8(8) = (240 & 0xff).toByte; vp8(9) = (240 >> 8).toByte
    val m1 = ImageHeader.parse(riff("VP8 ", vp8)).get
    assert(m1.format == "webp" && m1.width == 320 && m1.height == 240 &&
      m1.channels == 3, s"$m1")
    // VP8L lossless: 0x2F then (w-1) | (h-1)<<14 | alpha<<28.
    val bits = (99 - 1) | ((77 - 1) << 14) | (1 << 28)
    val vp8l = Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
    val m2 = ImageHeader.parse(riff("VP8L", vp8l)).get
    assert(m2.width == 99 && m2.height == 77 && m2.channels == 4, s"$m2")
    // VP8X extended: alpha flag + u24le canvas-1 dims.
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x10 // alpha
    vp8x(4) = ((1000 - 1) & 0xff).toByte
    vp8x(5) = (((1000 - 1) >> 8) & 0xff).toByte
    vp8x(7) = ((600 - 1) & 0xff).toByte
    vp8x(8) = (((600 - 1) >> 8) & 0xff).toByte
    val m3 = ImageHeader.parse(riff("VP8X", vp8x)).get
    assert(m3.width == 1000 && m3.height == 600 && m3.channels == 4, s"$m3")
    // Corrupt VP8 start code refuses; WAV (RIFF but not WEBP) refuses.
    val bad = riff("VP8 ", vp8.clone()); bad(23) = 0x00
    assert(ImageHeader.parse(bad).isEmpty)
  }

  test("garbage, truncation, and null are None — never a throw") {
    assert(ImageHeader.parse(null).isEmpty)
    assert(ImageHeader.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    val png = img("png", 30, 30)
    val jpg = img("jpg", 30, 30)
    for (cut <- Seq(1, 4, 8, 12, 20)) {
      assert(ImageHeader.parse(png.take(cut)).isEmpty, s"png cut $cut")
      assert(ImageHeader.parse(jpg.take(cut)).isEmpty, s"jpg cut $cut")
    }
    // A corrupted JPEG marker stream desyncs to None, not an exception.
    val bad = jpg.clone(); bad(2) = 0x00
    assert(ImageHeader.parse(bad).isEmpty)
    // A standalone TEM marker (0xFF 0x01, no length field, T.81
    // §B.1.1.3) between SOI and SOF must be skipped, not read as a
    // length-bearing segment (which would desync the walk to None).
    val jpgTem = {
      val b = img("jpg", 30, 30)
      b.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ b.drop(2)
    }
    val tem = ImageHeader.parse(jpgTem)
      .getOrElse(fail("TEM-bearing JPEG: parse returned None"))
    assert(tem.width == 30 && tem.height == 30, s"TEM jpeg: $tem")
    // A stream that ENDS in a run of 0xFF fill bytes must not read
    // past the buffer (the fill-byte skip loop's end condition).
    val ffRun = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)
    assert(ImageHeader.parse(ffRun).isEmpty)
  }

  test("OS/2 core-header BMP parses its own field layout, not the info-header one") {
    // BITMAPCOREHEADER: size 12 at offset 14, u16 width/height at
    // 18/20, u16 bpp at 24. Built by hand — ImageIO writes info
    // headers only.
    def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val core = Array('B'.toByte, 'M'.toByte) ++ u32(26 + 100 * 50 * 3) ++
      u32(0) ++ u32(26) ++ u32(12) ++ u16(100) ++ u16(50) ++ u16(1) ++ u16(24)
    val m = ImageHeader.parse(core).getOrElse(fail("core BMP: None"))
    assert(m == ImageHeader.Meta("bmp", 100, 50, 3), s"got $m")
    // An unknown DIB size refuses rather than misparsing.
    val weird = core.clone(); weird(14) = 16
    assert(ImageHeader.parse(weird).isEmpty)
  }

  test("fromBinary feeds aspect bucketing and resize planning with real bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val blobs = Seq(
      (1L, img("png", 40, 20)),   // ar_q = floor(40*4/20) = 8
      (2L, img("jpg", 32, 32)),   // ar_q = 4
      (3L, img("gif", 16, 48)),   // ar_q = 1
      (4L, img("bmp", 60, 30)),   // ar_q = 8
      (5L, "garbage".getBytes))      // unparseable -> null metadata
    val media = ImageHeader.fromBinary(blobs.toDF("doc_id", "media"))
    val metas = media.select($"doc_id", $"format", $"width", $"height")
      .as[(Long, String, Option[Int], Option[Int])].collect().sortBy(_._1)
    assert(metas.map(_._2).toSeq == Seq("png", "jpeg", "gif", "bmp", null))
    assert(metas(0)._3.contains(40) && metas(0)._4.contains(20))

    // aspectBuckets: the unparseable row drops; others bucket by shape.
    val buckets = Multimodal.aspectBuckets(media, batchSize = 4)
    val total = buckets.agg(sum($"n")).as[Long].head()
    assert(total == 4L, s"4 parseable blobs expected, got $total")
    assert(buckets.select($"ar_q").distinct().count() == 3) // {8, 4, 1}
    buckets.unpersist()

    // resizePlan: shorter side scales to 16 preserving aspect.
    val plan = Multimodal.resizePlan(media, shorter = 16)
      .select($"doc_id", $"target_w", $"target_h")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(plan == Seq((1L, 32L, 16L), (2L, 16L, 16L),
      (3L, 16L, 48L), (4L, 32L, 16L)))
  }

  test("decodeImages: full-pixel decode yields the encoded geometry; garbage stays null") {
    import spark.implicits._
    val blobs = Seq(
      (1L, img("png", 40, 20)), (2L, img("jpg", 64, 48)),
      (3L, img("gif", 16, 48)), (4L, img("bmp", 24, 36)),
      (5L, "garbage".getBytes), (6L, null: Array[Byte]))
    val decoded = Multimodal.decodeImages(blobs.toDF("doc_id", "media"))
      .select($"doc_id", $"width", $"height")
      .as[(Long, Option[Int], Option[Int])].collect().sortBy(_._1)
    assert(decoded.map(d => (d._2, d._3)).toSeq == Seq(
      (Some(40), Some(20)), (Some(64), Some(48)), (Some(16), Some(48)),
      (Some(24), Some(36)), (None, None), (None, None)))
    // Pixel decode and header parse agree on geometry for well-formed
    // files — the contract that lets the header path stand in for the
    // decode path on the oracle gate.
    val viaHeader = ImageHeader
      .fromBinary(blobs.take(4).toDF("doc_id", "media"))
      .select($"doc_id", $"width", $"height")
      .as[(Long, Option[Int], Option[Int])].collect().sortBy(_._1)
    assert(viaHeader.map(d => (d._2, d._3)).toSeq ==
      decoded.take(4).map(d => (d._2, d._3)).toSeq)
  }

  test("resizeImages realizes resizePlan's geometry with real pixel buffers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A solid-red PNG: bilinear resampling of a constant image is the
    // same constant, so output pixels are checkable exactly.
    val red = {
      val im = new BufferedImage(40, 20, BufferedImage.TYPE_3BYTE_BGR)
      val g = im.createGraphics()
      try { g.setColor(java.awt.Color.RED); g.fillRect(0, 0, 40, 20) }
      finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(im, "png", out); out.toByteArray
    }
    val blobs = Seq(
      (1L, red), (2L, img("jpg", 64, 48)), (3L, img("bmp", 24, 36)),
      (4L, "garbage".getBytes), (5L, null: Array[Byte]))
    val df = blobs.toDF("doc_id", "media")
    val resized = Multimodal.resizeImages(df, shorter = 16)
      .select($"doc_id", $"target_w", $"target_h",
        octet_length($"rgb").as("n"), $"rgb")
      .as[(Long, Int, Int, Int, Array[Byte])].collect().sortBy(_._1)
    // Undecodable and null rows drop; decodable ones resize.
    assert(resized.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // Geometry AND buffer size equal resizePlan's integer math, row
    // for row (out_bytes is exactly the allocated raster).
    val plan = Multimodal.resizePlan(
      Multimodal.decodeImages(df), shorter = 16)
      .select($"doc_id", $"target_w", $"target_h", $"out_bytes")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(plan.map(p => (p._1, p._2, p._3, p._4)).toSeq ==
      resized.map(r => (r._1, r._2.toLong, r._3.toLong, r._4.toLong)).toSeq)
    // The red PNG stays solid red through the bilinear resample
    // (BGR channel order: 0, 0, 255 per pixel).
    val rgb = resized(0)._5
    assert(rgb.length == 32 * 16 * 3)
    assert(rgb.grouped(3).forall(p =>
      p(0) == 0 && p(1) == 0 && (p(2) & 0xff) == 255))
  }

  /** Real WAV bytes synthesized in-test: `seconds` of a sine at `freq`
    * Hz, amplitude `amp` (of full scale), 16-bit mono PCM at `rate`.
    */
  private def wav(freq: Double, seconds: Double, amp: Double,
      rate: Int = 8000): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](2 * n)
    (0 until n).foreach { i =>
      val s = (amp * 32767.0 *
        math.sin(2 * math.Pi * freq * i / rate)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeAudioFeatures: real WAV decode matches known signal math") {
    import spark.implicits._
    val blobs = Seq(
      (1L, wav(freq = 440, seconds = 0.5, amp = 0.5)),
      (2L, wav(freq = 100, seconds = 1.0, amp = 0.9)),
      (3L, "not audio".getBytes), (4L, null: Array[Byte]))
    val rows = Multimodal.decodeAudioFeatures(blobs.toDF("doc_id", "media"))
      .select($"doc_id", $"sample_rate", $"channels", $"n_audio_frames",
        $"duration_ms", $"rms", $"peak", $"zero_crossings")
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Long],
        Option[Double], Option[Double], Option[Long])]
      .collect().sortBy(_._1)

    // Undecodable and null blobs quarantine with NULL features.
    assert(rows(2)._2.isEmpty && rows(3)._2.isEmpty)

    val a = rows(0)
    assert(a._2.contains(8000) && a._3.contains(1))
    assert(a._4.contains(4000L) && a._5.contains(500L))
    // Sine RMS = A/√2; peak = A (within quantization).
    assert(math.abs(a._6.get - 0.5 / math.sqrt(2)) < 0.01, s"rms ${a._6}")
    assert(math.abs(a._7.get - 0.5) < 0.01, s"peak ${a._7}")
    // A sine crosses zero 2·freq·seconds times.
    assert(math.abs(a._8.get - 440L) <= 2L, s"zc ${a._8}")

    val b = rows(1)
    assert(b._4.contains(8000L) && b._8.exists(z => math.abs(z - 200L) <= 2L))
    assert(math.abs(b._6.get - 0.9 / math.sqrt(2)) < 0.01)
  }
}
