package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real video-container parsing from a binary column — ISO BMFF / MP4
  * (ISO/IEC 14496-12) and AVI (RIFF) — geometry, duration, codec
  * fourcc, frame count, and the full keyframe BYTE-RANGE map, without
  * decoding a single frame. This is the video sibling of
  * [[ImageHeader]] (round 8/9 landed image pixels and PCM audio; video
  * decode proper needs codec libraries that stay stubbed, but the
  * container layer — everything a distributed pipeline does BEFORE
  * handing sample payloads to a codec — is pure public-format byte
  * walking and belongs in the engine):
  *
  *  - [[parse]]: per-blob metadata (format, codec, width/height,
  *    duration, frame/keyframe counts) from the `moov` sample tables
  *    (MP4) or the `avih`/`strh` headers (AVI).
  *  - [[keyframeRanges]]: exact (offset, size) of every sync sample,
  *    resolved through `stss` × `stsz` × `stsc` × `stco`/`co64` — the
  *    map a frame-sampling stage needs to slice REAL encoded frame
  *    payloads out of the blob (`substring` on the binary column) and
  *    ship only those to a decode UDF: at 100 TB the whole point is to
  *    never move the 97% of bytes that are non-key frames.
  *
  * Scale shape: narrow per-row maps over the blob column — no shuffle;
  * only the `moov` region is walked (sample tables are a few KB even
  * for hour-long files; `mdat` is never touched until a caller slices
  * chosen ranges). Malformed/unknown blobs yield null metadata
  * (quarantine rule, as [[ImageHeader.parse]]).
  */
object VideoContainer {

  /** Container metadata. `nKeyframes` counts sync samples (`stss`);
    * a track with no `stss` box has EVERY sample sync (14496-12 §8.6.2)
    * — then `nKeyframes == nFrames`.
    */
  final case class Meta(format: String, brand: String, codec: String,
      width: Int, height: Int, durationMs: Long, nFrames: Long,
      nKeyframes: Long)

  /** One sync sample's byte range within the blob (1-based sample
    * number; `offset` is 0-based from blob start).
    */
  final case class KeyframeRange(sample: Int, offset: Long, size: Long)

  // ---- byte readers ----------------------------------------------------
  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32be(b, i) << 32) | u32be(b, i + 4)
  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  // ---- MP4 / ISO BMFF ---------------------------------------------------

  /** Box scan of `[from, until)`: invokes `f(type, payloadFrom,
    * payloadUntil)` per box. Size 0 (= to end) and 1 (= 64-bit
    * largesize) per 14496-12 §4.2; malformed sizes end the walk rather
    * than throw.
    */
  private def walkBoxes(b: Array[Byte], from: Long, until: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val size0 = u32be(b, i.toInt)
      val typ = fourcc(b, i.toInt + 4)
      var payload = i + 8
      val boxEnd =
        if (size0 == 1L) {
          if (i + 16 > until) return
          payload = i + 16
          i + u64be(b, i.toInt + 8)
        } else if (size0 == 0L) until
        else i + size0
      if (boxEnd < payload || boxEnd > until) return // corrupt size
      f(typ, payload, boxEnd)
      i = boxEnd
    }
  }

  /** First child box of `typ` within `[from, until)`. */
  private def findBox(b: Array[Byte], from: Long, until: Long,
      typ: String): Option[(Long, Long)] = {
    var res: Option[(Long, Long)] = None
    walkBoxes(b, from, until) { (t, f, u) =>
      if (res.isEmpty && t == typ) res = Some((f, u))
    }
    res
  }

  private def path(b: Array[Byte], from: Long, until: Long,
      typs: String*): Option[(Long, Long)] =
    typs.foldLeft(Option((from, until))) {
      case (acc, t) => acc.flatMap { case (f, u) => findBox(b, f, u, t) }
    }

  /** The parsed sample tables of the FIRST video (`vide` handler)
    * track, plus presentation duration.
    */
  private final class Mp4Tables(
      val brand: String, val durationMs: Long, val codec: String,
      val width: Int, val height: Int, val trackId: Long,
      val sttsTotal: Long,
      val stss: Array[Int], // sync sample numbers, 1-based; empty = all
      val hasStss: Boolean,
      val stszFixed: Long, val stszSizes: Array[Long],
      val stsc: Array[(Long, Long)], // (firstChunk, samplesPerChunk)
      val stco: Array[Long])

  private def mp4Tables(b: Array[Byte]): Option[Mp4Tables] = {
    val n = b.length.toLong
    if (b.length < 12) return None
    val ftyp = findBox(b, 0, n, "ftyp").getOrElse(return None)
    if (ftyp._2 - ftyp._1 < 4) return None
    val brand = fourcc(b, ftyp._1.toInt)
    val (moovF, moovU) = findBox(b, 0, n, "moov").getOrElse(return None)

    val durationMs = mvhdMs(b, moovF, moovU).getOrElse(return None)

    // First trak whose hdlr is 'vide'.
    var video: Option[Mp4Tables] = None
    walkBoxes(b, moovF, moovU) { (t, f, u) =>
      if (video.isEmpty && t == "trak") {
        val isVideo = path(b, f, u, "mdia", "hdlr").exists { case (hf, hu) =>
          hu - hf >= 12 && fourcc(b, hf.toInt + 8) == "vide"
        }
        if (isVideo) video = (for {
          (sf, su) <- path(b, f, u, "mdia", "minf", "stbl")
          tk <- findBox(b, f, u, "tkhd")
        } yield {
          // tkhd width/height: 16.16 fixed point at payload end. v0
          // fixed fields: verflags 4 + times 4+4 + id 4 + reserved 4 +
          // duration 4 + reserved 8 + layer/group/volume/reserved 8 +
          // matrix 36 = 76; v1's 64-bit times/duration add 12.
          val tv = b(tk._1.toInt) & 0xff
          val geomOff = tk._1.toInt + (if (tv == 1) 88 else 76)
          val (w, h) =
            if (geomOff + 8 <= tk._2)
              ((u32be(b, geomOff) >> 16).toInt,
                (u32be(b, geomOff + 4) >> 16).toInt)
            else (0, 0)
          val idOff = tk._1 + (if (tv == 1) 20 else 12)
          val trackId =
            if (idOff + 4 <= tk._2) u32be(b, idOff.toInt) else 0L
          val codec = path(b, sf, su, "stsd").flatMap { case (df, du) =>
            // entry_count at +4, first sample entry: size u32 + fourcc
            if (du - df >= 16 && u32be(b, df.toInt + 4) >= 1)
              Some(fourcc(b, df.toInt + 12))
            else None
          }.getOrElse("")
          val sttsTotal = path(b, sf, su, "stts").map { case (tf, tu) =>
            val cnt = if (tu - tf < 8) 0L else u32be(b, tf.toInt + 4)
            var tot = 0L
            var k = 0
            while (k < cnt && tf + 8 + 8L * k + 8 <= tu) {
              tot += u32be(b, tf.toInt + 8 + 8 * k); k += 1
            }
            tot
          }.getOrElse(0L)
          // Table readers stop at the box edge — a truncated table
          // yields only its parseable prefix, never null/zero slots.
          val (stss, hasStss) = path(b, sf, su, "stss").map { case (yf, yu) =>
            val cnt = if (yu - yf < 8) 0 else u32be(b, yf.toInt + 4).toInt
            val out = Array.newBuilder[Int]
            var k = 0
            while (k < cnt && yf + 8 + 4L * k + 4 <= yu) {
              out += u32be(b, yf.toInt + 8 + 4 * k).toInt; k += 1
            }
            (out.result(), true)
          }.getOrElse((Array.empty[Int], false))
          val (fixed, sizes) = path(b, sf, su, "stsz").map { case (zf, zu) =>
            if (zu - zf < 12) (0L, Array.empty[Long]) else {
            val fix = u32be(b, zf.toInt + 4)
            val cnt = u32be(b, zf.toInt + 8).toInt
            if (fix != 0L) (fix, Array.empty[Long])
            else {
              val out = Array.newBuilder[Long]
              var k = 0
              while (k < cnt && zf + 12 + 4L * k + 4 <= zu) {
                out += u32be(b, zf.toInt + 12 + 4 * k); k += 1
              }
              (0L, out.result())
            }
            }
          }.getOrElse((0L, Array.empty[Long]))
          val stsc = path(b, sf, su, "stsc").map { case (cf, cu) =>
            val cnt = if (cu - cf < 8) 0 else u32be(b, cf.toInt + 4).toInt
            val out = Array.newBuilder[(Long, Long)]
            var k = 0
            while (k < cnt && cf + 8 + 12L * k + 12 <= cu) {
              out += ((u32be(b, cf.toInt + 8 + 12 * k),
                u32be(b, cf.toInt + 8 + 12 * k + 4)))
              k += 1
            }
            out.result()
          }.getOrElse(Array.empty[(Long, Long)])
          val stco = path(b, sf, su, "stco").map { case (of, ou) =>
            val cnt = if (ou - of < 8) 0 else u32be(b, of.toInt + 4).toInt
            val out = Array.newBuilder[Long]
            var k = 0
            while (k < cnt && of + 8 + 4L * k + 4 <= ou) {
              out += u32be(b, of.toInt + 8 + 4 * k); k += 1
            }
            out.result()
          }.orElse(path(b, sf, su, "co64").map { case (of, ou) =>
            val cnt = if (ou - of < 8) 0 else u32be(b, of.toInt + 4).toInt
            val out = Array.newBuilder[Long]
            var k = 0
            while (k < cnt && of + 8 + 8L * k + 8 <= ou) {
              out += u64be(b, of.toInt + 8 + 8 * k); k += 1
            }
            out.result()
          }).getOrElse(Array.empty[Long])
          new Mp4Tables(brand, durationMs, codec, w, h, trackId, sttsTotal,
            stss, hasStss, fixed, sizes, stsc, stco)
        })
      }
    }
    video
  }

  /** Fragmented-MP4 (CMAF/DASH delivery shape, 14496-12 §8.8): the
    * moov carries EMPTY sample tables and every frame fact lives in
    * per-fragment `moof → traf → trun` runs. One top-level box scan
    * accumulates the video track's samples in presentation order:
    * sizes/flags from trun entries (falling back to tfhd defaults and
    * honoring first-sample-flags), byte offsets from the traf base
    * (explicit base-data-offset, or the moof start under
    * default-base-is-moof — also the spec's default for the first
    * traf) plus the trun data offset. Sync = the
    * sample_is_non_sync_sample flag (bit 16) NOT set.
    */
  private final class FragStats(val nFrames: Long, val nKey: Long,
      val ranges: Array[KeyframeRange])

  private def fragments(b: Array[Byte], trackId: Long): FragStats = {
    var nFrames = 0L
    var nKey = 0L
    val out = Array.newBuilder[KeyframeRange]
    var sampleNo = 0
    // Movie-level defaults (mvex/trex, 14496-12 §8.8.3): the bottom of
    // the default chain — tfhd overrides trex, trun per-sample fields
    // override both. Real CMAF encoders routinely put the size/flags
    // defaults HERE and ship flagless truns.
    var trexSize = 0L
    var trexFlags = 0L
    findBox(b, 0, b.length.toLong, "moov").foreach { case (mvF, mvU) =>
      path(b, mvF, mvU, "mvex").foreach { case (xf, xu) =>
        walkBoxes(b, xf, xu) { (xt, tf, tu) =>
          // verflags 4 + track_ID 4 + descr_idx 4 + duration 4 +
          // size 4 + flags 4
          if (xt == "trex" && tu - tf >= 24 &&
            u32be(b, tf.toInt + 4) == trackId) {
            trexSize = u32be(b, tf.toInt + 16)
            trexFlags = u32be(b, tf.toInt + 20)
          }
        }
      }
    }
    walkBoxes(b, 0, b.length.toLong) { (t, mf, mu) =>
      if (t == "moof") {
        val moofStart = mf - 8
        walkBoxes(b, mf, mu) { (tt, tf, tu) =>
          if (tt == "traf") findBox(b, tf, tu, "tfhd").foreach { case (hf, hu) =>
            if (hu - hf >= 8 && u32be(b, hf.toInt + 4) == trackId) {
              val flags = (u32be(b, hf.toInt) & 0xffffffL).toInt
              var p = hf + 8
              var base = moofStart
              if ((flags & 0x1) != 0) { // base-data-offset present
                if (p + 8 <= hu) base = u64be(b, p.toInt)
                p += 8
              }
              if ((flags & 0x2) != 0) p += 4 // sample-description-index
              var defSize = trexSize
              var defFlags = trexFlags
              if ((flags & 0x8) != 0) p += 4 // default-sample-duration
              if ((flags & 0x10) != 0) {
                if (p + 4 <= hu) defSize = u32be(b, p.toInt)
                p += 4
              }
              if ((flags & 0x20) != 0) {
                if (p + 4 <= hu) defFlags = u32be(b, p.toInt)
                p += 4
              }
              walkBoxes(b, tf, tu) { (rt, rf, ru) =>
                if (rt == "trun" && ru - rf >= 8) {
                  val rflags = (u32be(b, rf.toInt) & 0xffffffL).toInt
                  val cnt0 = u32be(b, rf.toInt + 4)
                  var q = rf + 8
                  var off = base
                  if ((rflags & 0x1) != 0) { // data-offset (SIGNED 32)
                    if (q + 4 <= ru) off = base + u32be(b, q.toInt).toInt
                    q += 4
                  }
                  var firstFlags = -1L
                  if ((rflags & 0x4) != 0) {
                    if (q + 4 <= ru) firstFlags = u32be(b, q.toInt)
                    q += 4
                  }
                  // Bound sample_count by what the box can hold: a
                  // corrupt count with per-sample fields would walk
                  // past the box (caught per field), but with NO
                  // per-sample fields the loop consumes zero bytes per
                  // entry and a flipped count bit means billions of
                  // iterations. Per-entry width from the field flags;
                  // for flagless truns (legal when trex/tfhd supply
                  // the defaults) cap at 2^20 samples per trun —
                  // orders of magnitude past any real fragment — and
                  // refuse outright when the default size is 0 too
                  // (zero-byte samples describe nothing).
                  val entryBytes = 4 * (((rflags >> 8) & 1) +
                    ((rflags >> 9) & 1) + ((rflags >> 10) & 1) +
                    ((rflags >> 11) & 1))
                  val cnt =
                    if (entryBytes > 0) math.min(cnt0, (ru - q) / entryBytes)
                    else if (defSize > 0) math.min(cnt0, 1L << 20)
                    else 0L
                  var i = 0L
                  var ok = true
                  while (i < cnt && ok) {
                    var sz = defSize
                    var sfl =
                      if (i == 0L && firstFlags >= 0) firstFlags else defFlags
                    if ((rflags & 0x100) != 0) q += 4 // duration
                    if ((rflags & 0x200) != 0) { // size
                      if (q + 4 <= ru) sz = u32be(b, q.toInt) else ok = false
                      q += 4
                    }
                    if ((rflags & 0x400) != 0) { // per-sample flags
                      if (q + 4 <= ru) {
                        // explicit per-sample flags win except where
                        // first-sample-flags is defined to override
                        if (!(i == 0L && firstFlags >= 0))
                          sfl = u32be(b, q.toInt)
                      } else ok = false
                      q += 4
                    }
                    if ((rflags & 0x800) != 0) q += 4 // cts offset
                    if (ok) {
                      sampleNo += 1
                      nFrames += 1
                      if ((sfl & 0x10000L) == 0L) {
                        nKey += 1
                        out += KeyframeRange(sampleNo, off, sz)
                      }
                      off += sz
                    }
                    i += 1
                  }
                }
              }
            }
          }
        }
      }
    }
    new FragStats(nFrames, nKey, out.result())
  }

  private def mp4(b: Array[Byte]): Option[Meta] = mp4Tables(b).map { t =>
    if (t.sttsTotal > 0)
      Meta("mp4", t.brand, t.codec, t.width, t.height, t.durationMs,
        t.sttsTotal, if (t.hasStss) t.stss.length.toLong else t.sttsTotal)
    else {
      val fs = fragments(b, t.trackId)
      Meta("mp4", t.brand, t.codec, t.width, t.height, t.durationMs,
        fs.nFrames, fs.nKey)
    }
  }

  /** Byte ranges of every sync sample of the first video track
    * (1-based sample numbers). Resolution walks stsc's chunk runs in
    * order, accumulating per-chunk sample offsets from stsz — each
    * sample is visited once, O(nSamples), and only sync samples are
    * emitted. A FRAGMENTED file (empty moov tables) resolves through
    * the moof/traf/trun scan instead ([[fragments]]); an AVI through
    * its movi chunks + idx1 flags ([[aviIndex]]). Empty for
    * unrecognized / corrupt blobs.
    */
  def keyframeRanges(bytes: Array[Byte]): Array[KeyframeRange] = {
    if (bytes == null) return Array.empty
    mp4Tables(bytes) match {
      case Some(t) => rangesFromTables(bytes, t)
      case None =>
        // AVI: movi chunks + idx1 keyframe flags (aviIndex).
        if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
          fourcc(bytes, 8) == "AVI ")
          aviIndex(bytes).map(_.ranges).getOrElse(Array.empty)
        else Array.empty
    }
  }

  /** The decoder-configuration record of the first video track:
    * (sample-entry fourcc, record bytes) for an `avcC`/`hvcC`/`vpcC`/
    * `av1C` child of the stsd visual sample entry (14496-15 §5.4.2.1:
    * the config box sits after the 78 fixed VisualSampleEntry bytes).
    * None when the codec ships no config box (MJPEG-class) or the
    * blob is not BMFF — [[CodecConfig]] turns the record into exact
    * profile/level/bit-depth/geometry facts without a codec library.
    */
  def codecConfigBytes(b: Array[Byte]): Option[(String, Array[Byte])] = {
    if (b == null || b.length < 12) return None
    val n = b.length.toLong
    if (findBox(b, 0, n, "ftyp").isEmpty) return None
    val (moovF, moovU) = findBox(b, 0, n, "moov").getOrElse(return None)
    var res: Option[(String, Array[Byte])] = None
    walkBoxes(b, moovF, moovU) { (t, f, u) =>
      if (res.isEmpty && t == "trak") {
        val isVideo = path(b, f, u, "mdia", "hdlr").exists { case (hf, hu) =>
          hu - hf >= 12 && fourcc(b, hf.toInt + 8) == "vide"
        }
        if (isVideo) path(b, f, u, "mdia", "minf", "stbl", "stsd").foreach {
          case (df, du) =>
            // entry_count at +4; first entry box at +8.
            if (du - df >= 16 && u32be(b, df.toInt + 4) >= 1) {
              val entryF = df + 8
              val entrySize = u32be(b, entryF.toInt)
              val entryU = entryF + entrySize
              if (entrySize >= 86 && entryU <= du) {
                val hint = fourcc(b, entryF.toInt + 4)
                // Children start after the fixed VisualSampleEntry
                // fields: 8 header + 78 = 86.
                walkBoxes(b, entryF + 86, entryU) { (ct, cf, cu) =>
                  if (res.isEmpty &&
                    (ct == "avcC" || ct == "hvcC" || ct == "vpcC" ||
                      ct == "av1C"))
                    res = Some((hint, java.util.Arrays.copyOfRange(
                      b, cf.toInt, cu.toInt)))
                }
              }
            }
        }
      }
    }
    res
  }

  /** Codec fourcc + sync-sample ranges from ONE container parse — the
    * decode path's exact needs ([[graft.operators.Multimodal
    * .decodeKeyframes]] previously paid a full parse for the codec
    * filter and a second for the range map, per blob). `codecGate`
    * short-circuits the range resolution for codecs the caller cannot
    * decode anyway (ranges come back empty, codec still reported) —
    * on an AVC/VP9-heavy corpus the reject path stays O(header). The
    * AVI arm re-walks the chunk HEADERS once more inside [[avi]]'s
    * movi-fact override (8 bytes read per frame — noise next to any
    * decode).
    */
  def codecRanges(bytes: Array[Byte],
      codecGate: String => Boolean = _ => true)
      : Option[(String, Array[KeyframeRange])] =
    if (bytes == null) None
    else mp4Tables(bytes) match {
      case Some(t) =>
        Some((t.codec,
          if (codecGate(t.codec)) rangesFromTables(bytes, t)
          else Array.empty[KeyframeRange]))
      case None =>
        if (bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
          fourcc(bytes, 8) == "AVI ")
          avi(bytes).map(m =>
            (m.codec,
              if (codecGate(m.codec))
                aviIndex(bytes).map(_.ranges).getOrElse(Array.empty)
              else Array.empty[KeyframeRange]))
        else None
    }

  private def rangesFromTables(bytes: Array[Byte],
      t: Mp4Tables): Array[KeyframeRange] = {
    val nSamples =
      (if (t.stszFixed != 0L) t.sttsTotal else t.stszSizes.length.toLong)
        .min(t.sttsTotal).toInt
    // Empty moov tables = fragmented file: frame facts live in moofs.
    if (nSamples <= 0 || t.stco.isEmpty || t.stsc.isEmpty)
      return fragments(bytes, t.trackId).ranges
    def sizeOf(s0: Int): Long = // 0-based
      if (t.stszFixed != 0L) t.stszFixed else t.stszSizes(s0)
    val sync: Int => Boolean =
      if (!t.hasStss) _ => true
      else { val set = t.stss.toSet; s => set.contains(s) }
    val out = Array.newBuilder[KeyframeRange]
    var sample = 1 // 1-based
    var run = 0
    var chunk = t.stsc(0)._1.toInt // 1-based chunk number
    // chunk >= 1: a corrupt stsc first_chunk of 0 (or a value whose
    // .toInt wrapped negative) would index stco(-1) — refuse with the
    // empty result, per the quarantine contract.
    while (sample <= nSamples && chunk >= 1 && chunk <= t.stco.length) {
      // samples-per-chunk for the current chunk: the last stsc run
      // whose first_chunk <= chunk (runs are ascending by first_chunk).
      while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = t.stsc(run)._2.toInt
      var off = t.stco(chunk - 1)
      var k = 0
      while (k < perChunk && sample <= nSamples) {
        val sz = sizeOf(sample - 1)
        if (sync(sample)) out += KeyframeRange(sample, off, sz)
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    out.result()
  }

  // ---- AVI (RIFF) --------------------------------------------------------

  // RIFF chunk walk: fourcc + u32le size (+ LIST subtype).
  private def riffWalk(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 8 <= until) {
      val typ = fourcc(b, i)
      val sz = u32le(b, i + 4)
      val end = i + 8 + sz
      if (end > until || sz < 0) return
      f(typ, i + 8, end.toInt)
      i = (end + (sz & 1L)).toInt // chunks are word-aligned
    }
  }

  /** First LIST of `subtype`: (subtypePos, end) — data chunks begin at
    * subtypePos + 4; idx1 offsets are conventionally relative to
    * subtypePos (the 'movi' fourcc position).
    */
  private def riffFindList(b: Array[Byte], from: Int, until: Int,
      subtype: String): Option[(Int, Int)] = {
    var res: Option[(Int, Int)] = None
    riffWalk(b, from, until) { (t, f, u) =>
      if (res.isEmpty && t == "LIST" && u - f >= 4 &&
        fourcc(b, f) == subtype) res = Some((f, u))
    }
    res
  }

  /** Stream-0 video data chunk: '00dc' (compressed) / '00db' (raw). */
  private def isVideoChunk(id: String): Boolean =
    id.length == 4 && id(0) == '0' && id(1) == '0' &&
      ((id(2) == 'd' && (id(3) == 'c' || id(3) == 'b')))

  private final class AviIndex(val nFrames: Long, val nKey: Long,
      val ranges: Array[KeyframeRange])

  /** Frame facts from the `movi` list: frame count from the video
    * data chunks; keyframe ranges from `idx1` (AVIIF_KEYFRAME =
    * 0x10; entry offsets are movi-relative by convention, absolute
    * file offsets detected per entry by checking the ckid lands where
    * claimed — both writer conventions exist in the wild). An AVI
    * without idx1 is treated as intra-only (every frame sync), which
    * is exact for the MJPEG/DV/raw codecs that ship index-less and
    * the right routing default for a pipeline that slices keyframes.
    * None when the blob has no movi list (header-only / metadata
    * ingest shape).
    */
  private def aviIndex(b: Array[Byte]): Option[AviIndex] = {
    val (mp, mu) = riffFindList(b, 12, b.length, "movi").getOrElse(return None)
    // The movi chunk walk is the FRAME record — idx1 may legally be
    // sparse (some capture tools index only sync frames), so counting
    // frames from idx1 entries would undercount. The walk also gives
    // each chunk's ordinal, which is how sparse idx1 entries recover
    // their true 1-based sample number (by data offset).
    val offB = Array.newBuilder[Long]
    val szB = Array.newBuilder[Long]
    riffWalk(b, mp + 4, mu) { (t, cf, cu) =>
      if (isVideoChunk(t)) { offB += cf.toLong; szB += (cu - cf).toLong }
    }
    val offs = offB.result()
    val sizes = szB.result()
    if (offs.isEmpty) return None
    // idx1 is a top-level sibling of the LISTs.
    var idx: Option[(Int, Int)] = None
    riffWalk(b, 12, b.length)((t, f, u) =>
      if (idx.isEmpty && t == "idx1") idx = Some((f, u)))
    idx match {
      case Some((f, u)) =>
        val ordinal = offs.zipWithIndex.toMap // data offset -> 0-based
        val out = Array.newBuilder[KeyframeRange]
        var nKey = 0L
        var e = f
        while (e + 16 <= u) {
          val ckid = fourcc(b, e)
          if (isVideoChunk(ckid)) {
            val flags = u32le(b, e + 4)
            val off = u32le(b, e + 8)
            val sz = u32le(b, e + 12)
            // Offset convention: movi-relative (to the 'movi' fourcc)
            // or absolute; trust whichever lands on the claimed ckid.
            val base =
              if (mp + off + 8 <= b.length && fourcc(b, (mp + off).toInt) == ckid)
                mp.toLong
              else if (off + 8 <= b.length && fourcc(b, off.toInt) == ckid)
                0L
              else -1L
            if (base >= 0 && (flags & 0x10L) != 0L)
              ordinal.get(base + off + 8).foreach { s0 =>
                nKey += 1
                out += KeyframeRange(s0 + 1, base + off + 8, sz)
              }
          }
          e += 16
        }
        Some(new AviIndex(offs.length.toLong, nKey, out.result()))
      case None =>
        // Index-less: intra-only assumption — every chunk is sync.
        val out = Array.newBuilder[KeyframeRange]
        var s = 0
        while (s < offs.length) {
          out += KeyframeRange(s + 1, offs(s), sizes(s))
          s += 1
        }
        Some(new AviIndex(offs.length.toLong, offs.length.toLong, out.result()))
    }
  }

  /** AVI: `RIFF size 'AVI '`, then `LIST hdrl` holds `avih`
    * (MicroSecPerFrame, TotalFrames, Width, Height at LE offsets
    * 0/16/32/36) and the first `LIST strl` with a `strh` whose
    * fccType is `vids` (codec fourcc at +4). When a `movi` list is
    * present, frame/keyframe counts come from the actual data chunks
    * and `idx1` ([[aviIndex]]) — the avih TotalFrames field is a
    * writer hint, not the record; header-only blobs (metadata ingest
    * shape) keep the avih numbers.
    */
  private def avi(b: Array[Byte]): Option[Meta] = {
    if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return None
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit =
      riffWalk(b, from, until)(f)
    def findList(from: Int, until: Int, subtype: String): Option[(Int, Int)] =
      riffFindList(b, from, until, subtype).map { case (p, u) => (p + 4, u) }
    val (hf, hu) = findList(12, b.length, "hdrl").getOrElse(return None)
    var meta: Option[Meta] = None
    var codec = ""
    var usPerFrame = 0L
    walk(hf, hu) { (t, f, u) =>
      if (t == "LIST" && u - f >= 4 && fourcc(b, f) == "strl" && codec.isEmpty)
        walk(f + 4, u) { (t2, f2, u2) =>
          if (t2 == "strh" && u2 - f2 >= 12 && fourcc(b, f2) == "vids")
            codec = fourcc(b, f2 + 4)
        }
      if (t == "avih" && u - f >= 40 && meta.isEmpty) {
        usPerFrame = u32le(b, f)
        val nFrames = u32le(b, f + 16)
        val w = u32le(b, f + 32).toInt
        val h = u32le(b, f + 36).toInt
        meta = Some(Meta("avi", "avi ", codec, w, h,
          nFrames * usPerFrame / 1000L, nFrames, nFrames))
      }
    }
    // codec may have been found after avih; patch it in, and replace
    // the avih frame hints with movi/idx1 facts when data is present.
    meta.map { m0 =>
      val m = if (m0.codec.isEmpty) m0.copy(codec = codec) else m0
      aviIndex(b) match {
        case Some(ix) =>
          m.copy(durationMs = ix.nFrames * usPerFrame / 1000L,
            nFrames = ix.nFrames, nKeyframes = ix.nKey)
        case None => m
      }
    }
  }

  /** Parse the container; None for null/unknown/corrupt blobs. */
  def parse(bytes: Array[Byte]): Option[Meta] =
    if (bytes == null) None else mp4(bytes).orElse(avi(bytes))

  /** mvhd: presentation timescale + duration (v0/v1) → ms. Length
    * guards matter even though walkBoxes bounds every box: a size-0
    * (to-EOF) box can still be SHORTER than its fixed layout. The ONE
    * definition behind both the video parse ([[mp4Tables]]) and the
    * audio-metadata layer ([[presentationDurationMs]]).
    */
  private def mvhdMs(b: Array[Byte], moovF: Long, moovU: Long): Option[Long] =
    path(b, moovF, moovU, "mvhd").flatMap { case (f, u) =>
      if (u - f < 24) None
      else {
        val v = b(f.toInt) & 0xff
        if (v == 1 && u - f < 32) None
        else {
          val (ts, dur) =
            if (v == 1) (u32be(b, f.toInt + 20), u64be(b, f.toInt + 24))
            else (u32be(b, f.toInt + 12), u32be(b, f.toInt + 16))
          if (ts <= 0) None else Some(dur * 1000L / ts)
        }
      }
    }

  /** mvhd presentation duration in ms for ANY BMFF blob (video or
    * audio-only) — exposed for the audio-metadata layer
    * ([[AudioContainer]]).
    */
  def presentationDurationMs(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 12) return None
    val n = b.length.toLong
    val (moovF, moovU) = findBox(b, 0, n, "moov").getOrElse(return None)
    mvhdMs(b, moovF, moovU)
  }

  /** BMFF blob with an audio (`soun`) track and NO video track — the
    * .m4a/.aac triage case [[parse]] correctly refuses (it is not a
    * video container) but a mixed-corpus router must not quarantine.
    * Returns (ftyp major brand, mvhd duration when present) from ONE
    * moov walk — the audio-metadata layer needs both, and this is a
    * per-row hot path.
    */
  def audioOnlyMp4Meta(b: Array[Byte]): Option[(String, Option[Long])] = {
    if (b == null || b.length < 12) return None
    val n = b.length.toLong
    val ftyp = findBox(b, 0, n, "ftyp").getOrElse(return None)
    if (ftyp._2 - ftyp._1 < 4) return None
    val (mf, mu) = findBox(b, 0, n, "moov").getOrElse(return None)
    var hasSoun = false
    var hasVide = false
    walkBoxes(b, mf, mu) { (t, f, u) =>
      if (t == "trak") path(b, f, u, "mdia", "hdlr").foreach { case (hf, hu) =>
        if (hu - hf >= 12) fourcc(b, hf.toInt + 8) match {
          case "soun" => hasSoun = true
          case "vide" => hasVide = true
          case _      =>
        }
      }
    }
    if (hasSoun && !hasVide)
      Some((fourcc(b, ftyp._1.toInt), mvhdMs(b, mf, mu)))
    else None
  }

  /** Brand-only form of [[audioOnlyMp4Meta]]. */
  def audioOnlyMp4(b: Array[Byte]): Option[String] =
    audioOnlyMp4Meta(b).map(_._1)

  // ---- Column / DataFrame API --------------------------------------------

  /** struct(format, brand, codec, width, height, duration_ms, n_frames,
    * n_keyframes), null when the blob is not a recognized container.
    * A UDF is the right tool, as [[ImageHeader.imageMeta]]: box walking
    * has no builtin and touches only the moov region.
    */
  def videoMeta(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      parse(b).map(m => (m.format, m.brand, m.codec, m.width, m.height,
        m.durationMs, m.nFrames, m.nKeyframes))
    }
    f(blob).cast("struct<format:string,brand:string,codec:string," +
      "width:int,height:int,duration_ms:bigint,n_frames:bigint," +
      "n_keyframes:bigint>")
  }

  /** Keyframe byte-range map as an array column of
    * struct(sample, offset, size) — feed to `explode` + binary
    * `substring` to slice real encoded keyframe payloads without ever
    * shipping non-key bytes to the decoder.
    */
  def keyframeMap(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      keyframeRanges(b).map(k => (k.sample, k.offset, k.size))
    }
    f(blob).cast("array<struct<sample:int,offset:bigint,size:bigint>>")
  }

  /** One row per keyframe with the REAL encoded payload sliced from the
    * blob: (doc_id, sample, offset, size, payload). The decode of
    * `payload` to pixels is the documented codec-stub boundary
    * ([[Multimodal]] scaladoc); everything up to it — which bytes, of
    * which samples, shipped where — is exact. `substring` on a binary
    * column is codegen'd; only keyframe bytes survive the projection,
    * so the non-key majority of `mdat` never leaves the scan.
    */
  def keyframePayloads(df: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("_b"),
        explode(keyframeMap(col(blobCol))).as("kf"))
      .select(col("doc_id"), col("kf.sample").as("sample"),
        col("kf.offset").as("offset"), col("kf.size").as("size"),
        expr("substring(_b, kf.offset + 1, kf.size)").as("payload"))
}
