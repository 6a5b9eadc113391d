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
