package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A deployment's codec-library provider, in miniature: claims a codec
  * the JDK cannot decode ("av01") and reconstructs frame facts from
  * the sliced payload bytes ALONE — codedMp4 frames payloads as
  * u32(sampleIdx) + fill bytes of ((idx*31) & 0xff), so a wrong slice
  * yields a wrong row, not a quarantine. Top-level object: decoders
  * ride the UDF closure to executors and must serialize without an
  * enclosing test instance.
  */
object FakeAv1Decoder extends SampleDecoder.FrameDecoder {
  val codecs: Set[String] = Set("av01")
  def decode(codec: String, payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 5) return None
    val idx = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
      ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
    if (idx <= 0 || idx > 4096) return None
    val fill = payload(4) & 0xff
    // Frame geometry derived from the payload: width = sample index
    // (proves the decode step received THIS sample's exact slice).
    val img = new java.awt.image.BufferedImage(idx, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(fill, fill, fill))
      g.fillRect(0, 0, idx, 2)
    } finally g.dispose()
    Some(img)
  }
}

/** A fake compressed-audio provider: claims a "FAKE" magic and
  * synthesizes n frames of constant +0.5 amplitude mono PCM, where n
  * is the byte after the magic — RMS = peak = 0.5 exactly, zero
  * crossings 0.
  */
object FakePcmDecoder extends SampleDecoder.PcmDecoder {
  def claims(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 5 &&
      new String(payload, 0, 4, "ISO-8859-1") == "FAKE"
  def decode(payload: Array[Byte])
      : Option[javax.sound.sampled.AudioInputStream] = {
    val n = payload(4) & 0xff
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) { // 16384 = 0.5 in s16le
      pcm(2 * i) = 0x00; pcm(2 * i + 1) = 0x40
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    Some(new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong))
  }
}

class SampleDecoderSpec extends SparkSpec {

  test("a registered fake codec provider rides the certified " +
    "byte-range slicing plan (frames)") {
    val s = spark
    import s.implicits._
    // av01 in MP4: real container, samples the JDK cannot rasterize.
    val blob = VideoFixtures.codedMp4(32, 24, 5, nFrames = 9,
      keyEvery = 3, codec = "av01", config = Array[Byte](1, 2, 3))
    val df = Seq((1L, blob)).toDF("doc_id", "media")
    // Default providers: the codec is unclaimed -> excluded entirely
    // (the quarantine/stub boundary, unchanged).
    assert(Multimodal.decodeKeyframes(df).count() == 0L)
    // Prepending the provider routes ONLY the sync-sample byte ranges
    // through it - same certified slicing plan, zero engine edits.
    val rows = Multimodal.decodeKeyframes(df,
        decoders = FakeAv1Decoder +: SampleDecoder.frameDefaults)
      .select($"sample", $"frame_w", $"frame_h", $"mean_r", $"mean_g")
      .as[(Int, Int, Int, Int, Int)].collect().sortBy(_._1)
    val want = VideoFixtures.keyframeSamples(9, 3)
      .map(i => (i, i, 2, (i * 31) & 0xff, (i * 31) & 0xff))
    assert(rows.toSeq == want)
  }

  test("MJPEG still resolves through the default provider (gate " +
    "behavior unchanged by the SPI)") {
    val s = spark
    import s.implicits._
    val blob = VideoFixtures.mjpegMp4(48, 32, 5, nFrames = 6,
      keyEvery = 2, rgbOf = _ => 0x808080)
    val out = Multimodal.decodeKeyframes(
      Seq((1L, blob)).toDF("doc_id", "media")).collect()
    assert(out.length == 3) // samples 1, 3, 5
    out.foreach(r => assert(r.getInt(2) == 48 && r.getInt(3) == 32))
  }

  test("a fake PCM provider joins the chain; unclaimed bytes keep " +
    "NULL features") {
    val s = spark
    import s.implicits._
    val fake = Array[Byte]('F', 'A', 'K', 'E', 16)
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val df = Seq((1L, fake), (2L, junk)).toDF("doc_id", "media")
    val out = Multimodal.decodeAudioFeatures(df,
        decoders = FakePcmDecoder +: SampleDecoder.pcmDefaults)
      .select($"doc_id", $"sample_rate", $"n_audio_frames", $"rms",
        $"peak", $"zero_crossings")
      .collect().sortBy(_.getLong(0))
    assert(out(0).getInt(1) == 8000)
    assert(out(0).getLong(2) == 16L)
    assert(math.abs(out(0).getDouble(3) - 0.5) < 1e-9)
    assert(math.abs(out(0).getDouble(4) - 0.5) < 1e-9)
    assert(out(0).getLong(5) == 0L)
    assert(out(1).isNullAt(1)) // junk: no provider claims -> quarantine
  }
}
