package graft.operators

import graft.SparkSpec

class MediaRouterSpec extends SparkSpec {

  test("triage dispatches every container family and quarantines the rest") {
    assert(MediaRouter.triage(ImageHeader.bmpFixture(20, 12)).get ==
      MediaRouter.Triage("image", "bmp", Some(20), Some(12), None, None))
    val mp4 = MediaRouter.triage(VideoFixtures.mp4(32, 24, 5, 7, 2)).get
    assert(mp4.kind == "video" && mp4.format == "mp4" &&
      mp4.width.contains(32) && mp4.nFrames.contains(7L))
    val fmp4 = MediaRouter.triage(VideoFixtures.fmp4(32, 24, 5, 7, 2)).get
    assert(fmp4.kind == "video" && fmp4.nFrames.contains(7L))
    val mkv = MediaRouter.triage(VideoFixtures.mkv(32, 24, 5, 7, 2)).get
    assert(mkv.kind == "video" && mkv.format == "mkv" &&
      mkv.nFrames.contains(7L))
    val avi = MediaRouter.triage(VideoFixtures.avi(64, 48, 40000L, 25L)).get
    assert(avi.kind == "video" && avi.format == "avi")
    // PCM audio magics (the JDK sound stack's formats).
    val wav = "RIFF1234WAVEfmt ".getBytes("US-ASCII")
    assert(MediaRouter.triage(wav).contains(
      MediaRouter.Triage("audio", "wav", None, None, None, None)))
    val au = ".snd then anything".getBytes("US-ASCII")
    assert(MediaRouter.triage(au).get.format == "au")
    // Quarantine: null, text, and truncated magic.
    assert(MediaRouter.triage(null).isEmpty)
    assert(MediaRouter.triage("hello world, not media".getBytes).isEmpty)
    assert(MediaRouter.triage(Array[Byte]('R', 'I', 'F', 'F')).isEmpty)
  }

  test("compressed-audio families triage: flac, mp3, ogg dispatch, m4a") {
    // FLAC stream marker.
    assert(MediaRouter.triage("fLaC then metadata blocks".getBytes)
      .get.format == "flac")
    // ID3v2-tagged MPEG audio.
    assert(MediaRouter.triage("ID3\u0004\u0000 tag then frames   ".getBytes)
      .get.format == "mp3")
    // Bare MPEG frame sync with VALID header fields (MPEG1 Layer III,
    // 128 kbps, 44.1 kHz): FF FB 90 00.
    val mp3 = Array(0xff, 0xfb, 0x90, 0x00, 0, 0, 0, 0, 0, 0, 0, 0)
      .map(_.toByte)
    assert(MediaRouter.triage(mp3).get.format == "mp3")
    // An 0xFF-leading blob with RESERVED fields must NOT claim mp3:
    // bitrate index 0xF.
    val badMp3 = Array(0xff, 0xfb, 0xf0, 0x00, 0, 0, 0, 0, 0, 0, 0, 0)
      .map(_.toByte)
    assert(MediaRouter.triage(badMp3).isEmpty)
    // Ogg first-page codec dispatch: header (27 bytes) + 1-segment
    // lacing table + identification header magic.
    def oggPage(payload: Array[Byte]): Array[Byte] = {
      val hdr = new Array[Byte](28)
      hdr(0) = 'O'; hdr(1) = 'g'; hdr(2) = 'g'; hdr(3) = 'S'
      hdr(26) = 1 // one lacing entry
      hdr(27) = payload.length.toByte
      hdr ++ payload
    }
    val vorbis = oggPage((Array(0x01.toByte) ++ "vorbis junk".getBytes))
    assert(MediaRouter.triage(vorbis).get ==
      MediaRouter.Triage("audio", "ogg-vorbis", None, None, None, None))
    val opus = oggPage("OpusHead junk".getBytes)
    assert(MediaRouter.triage(opus).get.format == "ogg-opus")
    val theora = oggPage((Array(0x80.toByte) ++ "theora junk".getBytes))
    assert(MediaRouter.triage(theora).get ==
      MediaRouter.Triage("video", "ogg-theora", None, None, None, None))
    // Audio-only BMFF routes as audio, not quarantine.
    assert(MediaRouter.triage(VideoFixtures.m4a()).get ==
      MediaRouter.Triage("audio", "m4a", None, None, None, None))
    // ...but a VIDEO mp4 still routes as video (soun-only test is
    // order-independent of the video parsers).
    assert(MediaRouter.triage(VideoFixtures.mp4(32, 24, 5, 4, 2))
      .get.kind == "video")
  }

  test("documents route to the extraction fleet, not quarantine — " +
    "and never claim media or vice versa") {
    assert(MediaRouter.triage(PdfFixtures.pdf(3L)).get ==
      MediaRouter.Triage("document", "pdf", None, None, None, None))
    assert(MediaRouter.triage(DocxFixtures.docx(3L)).get ==
      MediaRouter.Triage("document", "docx", None, None, None, None))
    // Junk-prefixed PDF (a crawl artifact) still routes; junk past the
    // spec's 1024-byte recovery window does not.
    assert(MediaRouter.triage(("x" * 64).getBytes ++ PdfFixtures.pdf(1L))
      .get.format == "pdf")
    assert(MediaRouter.triage(
      new Array[Byte](2000) ++ PdfFixtures.pdf(1L)).isEmpty)
    // A plain zip that is NOT a docx stays quarantined.
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    z.write("hi".getBytes); z.closeEntry(); z.close()
    assert(MediaRouter.triage(out.toByteArray).isEmpty)
    // Media still wins its own magics (order independence).
    assert(MediaRouter.triage(AudioFixtures.wav(8000, 1, 100))
      .get.kind == "audio")
  }

  test("route keeps quarantine rows with null kind") {
    import spark.implicits._
    val df = Seq(
      (1L, ImageHeader.bmpFixture(16, 12)),
      (2L, VideoFixtures.mkv(32, 24, 5, 6, 3)),
      (3L, "garbage".getBytes)).toDF("doc_id", "media")
    val routed = MediaRouter.route(df)
      .select($"doc_id", $"kind", $"format", $"n_frames").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(routed(1L) == ((Some("image"), Some("bmp"), None)))
    assert(routed(2L) == ((Some("video"), Some("mkv"), Some(6L))))
    assert(routed(3L) == ((None, None, None)))
  }
}
