package graft.operators

import graft.SparkSpec

class SubtitlesSpec extends SparkSpec {

  test("vtt and srt fixtures round-trip the shared cue schedule") {
    Seq(1, 3, 8).foreach { n =>
      val vtt = Subtitles.parse(Subtitles.vttFixture(n)).get
      assert(vtt.format == "vtt" && vtt.cues.length == n)
      val srt = Subtitles.parse(Subtitles.srtFixture(n)).get
      assert(srt.format == "srt" && srt.cues.length == n)
      (0 until n).foreach { i =>
        val exp = Subtitles.fixtureCue(i)
        assert(vtt.cues(i) == exp)
        assert(srt.cues(i) == exp)
      }
    }
  }

  test("real-world shapes: BOM, CRLF, cue ids, settings, NOTE blocks") {
    val vtt = "\uFEFFWEBVTT\r\n\r\nNOTE a comment\r\nstill comment\r\n\r\n" +
      "intro-cue-id\r\n01:01.000 --> 01:03.500 align:start line:0\r\n" +
      "Hello\r\nworld\r\n\r\n" +
      "02:00:00.000 --> 02:00:01.000\r\nlate\r\n"
    val t = Subtitles.parse(vtt).get
    assert(t.format == "vtt" && t.cues.length == 2)
    assert(t.cues(0) == Subtitles.Cue(61000L, 63500L, "Hello\nworld"))
    assert(t.cues(1).startMs == 7200000L && t.cues(1).text == "late")
  }

  test("malformed cues are skipped; the file survives") {
    val srt = "1\n00:00:01,000 --> 00:00:02,000\nok\n\n" +
      "2\n00:00:99,000 --> 00:00:98,000\nbad seconds\n\n" + // ss > 59
      "3\n00:00:05,000 --> 00:00:04,000\nend < start\n\n" +
      "4\n00:00:07,000 --> 00:00:08,000\nok2\n"
    val t = Subtitles.parse(srt).get
    assert(t.cues.map(_.text).toSeq == Seq("ok", "ok2"))
  }

  test("non-subtitle text refuses as None") {
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse("").isEmpty)
    assert(Subtitles.parse("just some prose\nwith lines").isEmpty)
    assert(Subtitles.parse("123\nnot a timestamp line").isEmpty)
    // An arrow is not enough without the SRT counter or VTT magic.
    assert(Subtitles.parse("a --> b\ntext").isEmpty)
  }

  test("column stats and cue explode") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0L, Subtitles.vttFixture(4)), (1L, Subtitles.srtFixture(2)),
      (2L, "prose")).toDF("id", "t")
      .withColumn("s", Subtitles.subtitleStats($"t"))
      .withColumn("cues", Subtitles.subtitleCues($"t"))
    val rows = df.select($"id", $"s.format", $"s.n_cues", $"s.speech_ms",
      size($"cues").as("nc"))
      .as[(Long, String, Option[Int], Option[Long], Option[Int])]
      .collect().sortBy(_._1)
    assert(rows(0) == ((0L, "vtt", Some(4),
      Some(1000L + 1100 + 1200 + 1300), Some(4))))
    assert(rows(1) == ((1L, "srt", Some(2), Some(2100L), Some(2))))
    assert(rows(2)._2 == null && rows(2)._5.isEmpty) // null for prose
  }
}
