package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WebVTT / SubRip (SRT) subtitle parsing — the TEXT TRACK of the
  * media family: caption files are how a video corpus carries aligned
  * transcripts, and a video-text training pipeline needs cue
  * timestamps + text (clip/caption pair mining, speech-density
  * filtering) long before any audio model runs. Both formats are
  * public, line-oriented containers (WebVTT: W3C spec; SRT: the de
  * facto SubRip form); the parse is a single bounded scan.
  *
  *  - [[parse]]: format tag + cue list (startMs, endMs, text).
  *    WebVTT is detected by its required "WEBVTT" header line
  *    (optional BOM), SRT by the leading numeric counter + comma
  *    millisecond timestamps. Malformed cues are SKIPPED (a damaged
  *    cue must not poison the file — the per-row quarantine rule
  *    scoped down to the cue); a blob with a recognized header but
  *    zero parseable cues still reports its format.
  *  - [[subtitleStats]] / [[subtitleCues]]: Column forms — stats
  *    struct, or the exploded-ready cue array for alignment joins
  *    against [[VideoContainer.keyframeRanges]] timestamps.
  *
  * Scale shape: narrow per-row map, no shuffle.
  */
object Subtitles {

  final case class Cue(startMs: Long, endMs: Long, text: String)
  final case class Track(format: String, cues: Array[Cue])

  /** `HH:MM:SS.mmm` (VTT, also accepts `MM:SS.mmm`) or `HH:MM:SS,mmm`
    * (SRT) → milliseconds; -1 on malformed.
    */
  private[operators] def timeMs(s: String): Long = {
    val t = s.trim
    val sep = if (t.indexOf(',') >= 0) ',' else '.'
    val dot = t.lastIndexOf(sep)
    if (dot < 0) return -1L
    val ms = t.substring(dot + 1)
    if (ms.length != 3 || !ms.forall(_.isDigit)) return -1L
    val parts = t.substring(0, dot).split(":")
    if (parts.isEmpty || parts.length > 3 ||
      !parts.forall(p => p.nonEmpty && p.forall(_.isDigit))) return -1L
    val (hh, mm, ss) = parts.length match {
      case 3 => (parts(0).toLong, parts(1).toLong, parts(2).toLong)
      case 2 => (0L, parts(0).toLong, parts(1).toLong)
      case _ => return -1L // bare seconds are not legal in either spec
    }
    if (mm > 59 || ss > 59) return -1L
    ((hh * 60 + mm) * 60 + ss) * 1000 + ms.toLong
  }

  private val Arrow = "-->"

  /** Parse a subtitle file; None unless it is recognizably WebVTT or
    * SRT. Cue text joins continuation lines with '\n'; VTT NOTE/STYLE
    * blocks and cue identifiers are skipped; SRT counters are not
    * trusted (renumbered files are the norm).
    */
  def parse(s: String): Option[Track] = {
    if (s == null || s.isEmpty) return None
    val body = if (s.charAt(0) == '\uFEFF') s.substring(1) else s
    val lines = body.split("\r\n|\n|\r", -1)
    val isVtt = lines.nonEmpty && (lines(0) == "WEBVTT" ||
      lines(0).startsWith("WEBVTT "))
    // SRT: first non-blank line is a bare counter, next has an arrow.
    val firstIdx = lines.indexWhere(_.trim.nonEmpty)
    val isSrt = !isVtt && firstIdx >= 0 && firstIdx + 1 < lines.length &&
      lines(firstIdx).trim.forall(_.isDigit) &&
      lines(firstIdx).trim.nonEmpty &&
      lines(firstIdx + 1).contains(Arrow)
    if (!isVtt && !isSrt) return None

    val cues = Array.newBuilder[Cue]
    var i = if (isVtt) 1 else 0
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.contains(Arrow)) {
        val arrow = line.indexOf(Arrow)
        val start = timeMs(line.substring(0, arrow))
        // VTT allows cue settings after the end time: cut at the
        // first space past the timestamp.
        val endRaw = line.substring(arrow + Arrow.length).trim
        val sp = endRaw.indexOf(' ')
        val end = timeMs(if (sp < 0) endRaw else endRaw.substring(0, sp))
        val text = new StringBuilder
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty) {
          if (text.nonEmpty) text.append('\n')
          text.append(lines(i))
          i += 1
        }
        // Malformed timestamps skip the CUE, not the file.
        if (start >= 0 && end >= start)
          cues += Cue(start, end, text.toString)
      } else i += 1
    }
    Some(Track(if (isVtt) "vtt" else "srt", cues.result()))
  }

  /** struct(format, n_cues, speech_ms, n_chars) — speech_ms is the
    * summed cue span (the speech-density numerator of a clip filter);
    * null for unrecognized text.
    */
  def subtitleStats(text: Column): Column = {
    val f = udf { s: String =>
      parse(s).map { t =>
        (t.format, t.cues.length,
          t.cues.map(c => c.endMs - c.startMs).sum,
          t.cues.map(_.text.length.toLong).sum)
      }
    }
    f(text).cast("struct<format:string,n_cues:int,speech_ms:bigint," +
      "n_chars:bigint>")
  }

  /** array<struct<start_ms, end_ms, text>> — explode for cue-level
    * joins (e.g. against keyframe timestamps); null when unrecognized.
    */
  def subtitleCues(text: Column): Column = {
    val f = udf { s: String =>
      parse(s).map(_.cues.map(c => (c.startMs, c.endMs, c.text)))
    }
    f(text).cast("array<struct<start_ms:bigint,end_ms:bigint,text:string>>")
  }

  // ---- fixtures ---------------------------------------------------------

  /** Deterministic cue schedule shared by both builders and the gate
    * oracle: cue i (0-based) spans [i·2000, i·2000 + 1000 + (i%5)·100)
    * with text "c"·(3 + i%4).
    */
  def fixtureCue(i: Int): Cue =
    Cue(i * 2000L, i * 2000L + 1000L + (i % 5) * 100L, "c" * (3 + i % 4))

  private def fmtTime(ms: Long, sep: Char): String = {
    val h = ms / 3600000; val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60; val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  def vttFixture(nCues: Int): String = {
    val sb = new StringBuilder("WEBVTT\n\n")
    (0 until nCues).foreach { i =>
      val c = fixtureCue(i)
      sb.append(fmtTime(c.startMs, '.')).append(" --> ")
        .append(fmtTime(c.endMs, '.')).append('\n')
        .append(c.text).append("\n\n")
    }
    sb.toString
  }

  def srtFixture(nCues: Int): String = {
    val sb = new StringBuilder
    (0 until nCues).foreach { i =>
      val c = fixtureCue(i)
      sb.append(i + 1).append('\n')
        .append(fmtTime(c.startMs, ',')).append(" --> ")
        .append(fmtTime(c.endMs, ',')).append('\n')
        .append(c.text).append("\n\n")
    }
    sb.toString
  }
}
