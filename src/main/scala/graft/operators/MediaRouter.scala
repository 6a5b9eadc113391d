package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unified media triage — the ENTRY POINT of a mixed-media corpus:
  * one pass over the blob column classifies every row by container
  * (image via [[ImageHeader]], video via [[VideoContainer]] /
  * [[MkvContainer]], audio via the RIFF/AIFF/AU magics the JDK sound
  * stack reads plus the compressed families a corpus actually
  * carries — FLAC, MP3 with frame-header validity, Ogg with real
  * first-page codec dispatch, audio-only BMFF) and extracts the
  * kind-appropriate geometry, so downstream stages
  * `filter($"kind" === ...)` into the right decode path and
  * everything unrecognized lands in quarantine EXPLICITLY
  * (kind = null) instead of failing deep inside a decoder.
  *
  * Detection is magic-byte dispatch, cheapest check first, and each
  * format parser re-validates its own structure — a blob is never
  * claimed by more than one parser (the container specs assert the
  * MP4/EBML disjointness). Scale shape: one narrow per-row map, no
  * shuffle; video parsers touch only metadata regions.
  */
object MediaRouter {

  /** (kind, format, width, height, duration_ms, n_frames) — kind in
    * {image, video, audio, document}; null struct = quarantine. Audio
    * and documents carry no cheap header geometry (audio frame math
    * needs the full decode, [[Multimodal.decodeAudioFeatures]];
    * document page counts need [[Pdf.pdfText]]/[[OfficeDoc.docx]]);
    * their fields stay null here beyond the format tag.
    */
  final case class Triage(kind: String, format: String,
      width: Option[Int], height: Option[Int],
      durationMs: Option[Long], nFrames: Option[Long])

  private def audioFormat(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 12) None
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
      Some("wav")
    else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F')
      Some("aiff") // AIFF and AIFC both start FORM....AIF
    else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')
      Some("au")
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      Some("flac")
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      Some("mp3") // ID3v2-tagged MPEG audio
    // Bare MPEG frame sync: demand the header fields be VALID so an
    // arbitrary 0xFF-leading binary doesn't claim mp3 (the shared
    // check, ANY layer — Layer I/II are MPEG audio too; only the
    // duration math in AudioContainer is Layer III-specific).
    else if (AudioContainer.validMpegSync(b, 0)) Some("mp3")
    else None
  }

  /** Ogg: the first page's payload leads with the codec's magic —
    * real dispatch, not an "Ogg is audio" guess (Theora video streams
    * exist). Payload located by the shared
    * [[AudioContainer.oggFirstPayload]] (RFC 3533 §6).
    */
  private def ogg(b: Array[Byte]): Option[Triage] = {
    val p = AudioContainer.oggFirstPayload(b)
    if (p < 0) return None
    if (p + 8 > b.length)
      return Some(Triage("audio", "ogg", None, None, None, None))
    val magic = new String(b, p, 8, "ISO-8859-1")
    if ((b(p) & 0xff) == 0x01 && magic.substring(1, 7) == "vorbis")
      Some(Triage("audio", "ogg-vorbis", None, None, None, None))
    else if (magic == "OpusHead")
      Some(Triage("audio", "ogg-opus", None, None, None, None))
    else if ((b(p) & 0xff) == 0x80 && magic.substring(1, 7) == "theora")
      Some(Triage("video", "ogg-theora", None, None, None, None))
    else Some(Triage("audio", "ogg", None, None, None, None))
  }

  def triage(b: Array[Byte]): Option[Triage] = {
    if (b == null) return None
    ImageHeader.parse(b).map(m =>
        Triage("image", m.format, Some(m.width), Some(m.height), None, None))
      .orElse(VideoContainer.parse(b).map(m =>
        Triage("video", m.format, Some(m.width), Some(m.height),
          Some(m.durationMs), Some(m.nFrames))))
      .orElse(MkvContainer.parse(b).map(m =>
        Triage("video", m.format, Some(m.width), Some(m.height),
          Some(m.durationMs), Some(m.nFrames))))
      // Rich audio metadata first (duration from the container,
      // [[AudioContainer]]); the magic-only tags below catch blobs
      // whose headers carry the magic but not parseable math, so a
      // half-corrupt file still routes to the audio fleet.
      .orElse(AudioContainer.parse(b).map(a =>
        Triage("audio", a.format, None, None, Some(a.durationMs), None)))
      .orElse(audioFormat(b).map(f =>
        Triage("audio", f, None, None, None, None)))
      .orElse(ogg(b))
      // Audio-only BMFF (.m4a): a video parse correctly refuses it,
      // but it must not land in quarantine.
      .orElse(VideoContainer.audioOnlyMp4(b).map(_ =>
        Triage("audio", "m4a", None, None, None, None)))
      // Documents (round 11): the mixed-corpus entry point must route
      // text carriers to the extraction fleet, not quarantine them.
      // PDF = header magic within the spec's 1024-byte recovery
      // window; DOCX = zip magic + the word/document.xml member name
      // present in the archive bytes (entry names are stored plain,
      // so no inflate is needed to dispatch).
      .orElse(documentFormat(b).map(f =>
        Triage("document", f, None, None, None, None)))
  }

  private def documentFormat(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 16) None
    // The EXACT zip magic at offset 0 dispatches before the fuzzy
    // positional "%PDF-" scan: a docx whose first KB happens to
    // contain those five bytes (a stored embedded PDF member, a
    // deflate coincidence) must not misroute as pdf.
    else if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) {
      if (indexOfAscii(b, "word/document.xml", b.length) >= 0) Some("docx")
      else None // a plain zip stays quarantined
    } else if (indexOfAscii(b, "%PDF-", 1024 + 5) >= 0) Some("pdf")
    else None
  }

  private def indexOfAscii(b: Array[Byte], pat: String, limit: Int): Int = {
    val p = pat.getBytes("US-ASCII")
    var i = 0
    val max = math.min(b.length, limit) - p.length
    while (i <= max) {
      var j = 0
      while (j < p.length && b(i + j) == p(j)) j += 1
      if (j == p.length) return i
      i += 1
    }
    -1
  }

  /** struct(kind, format, width, height, duration_ms, n_frames);
    * null = quarantine.
    */
  def mediaKind(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      triage(b).map(t => (t.kind, t.format, t.width, t.height,
        t.durationMs, t.nFrames))
    }
    f(blob).cast("struct<kind:string,format:string,width:int,height:int," +
      "duration_ms:bigint,n_frames:bigint>")
  }

  /** The routed frame: input columns + (kind, format, width, height,
    * duration_ms, n_frames), quarantine rows kept with kind null.
    */
  def route(df: DataFrame, blobCol: String = "media"): DataFrame =
    df.withColumn("_t", mediaKind(col(blobCol)))
      .select(df.columns.map(col) :+ col("_t.kind").as("kind") :+
        col("_t.format").as("format") :+ col("_t.width").as("width") :+
        col("_t.height").as("height") :+
        col("_t.duration_ms").as("duration_ms") :+
        col("_t.n_frames").as("n_frames"): _*)
}
