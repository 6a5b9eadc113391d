package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Matroska / WebM (EBML) container parsing from a binary column — the
  * third leg of the video container layer ([[VideoContainer]] covers
  * ISO BMFF/MP4 and AVI). Pure public-spec byte walking (RFC 8794
  * EBML + the Matroska element registry), JDK-only:
  *
  *  - Segment → Info: TimestampScale + Duration → duration_ms.
  *  - Segment → Tracks → first video TrackEntry: codec id,
  *    PixelWidth/PixelHeight.
  *  - Segment → Clusters → the track's block stream: frame count and
  *    keyframe count from BOTH block forms — SimpleBlock (keyframe
  *    flag in the header) and BlockGroup/Block (keyframe = no
  *    ReferenceBlock in the group) — with laced blocks counted at
  *    their packed frame count. Matroska has no MP4-style sample
  *    table, so frame-level facts come from the block stream itself;
  *    the walk reads each block's HEADER and skips its payload.
  *
  * Scale shape: identical to the MP4 path — a narrow per-row map, no
  * shuffle; cost is one linear scan of the blob's element headers
  * (payloads skipped). Malformed/truncated blobs quarantine as null.
  */
object MkvContainer {

  final case class Meta(format: String, codec: String, width: Int,
      height: Int, durationMs: Long, nFrames: Long, nKeyframes: Long)

  /** EBML varint at `i`: (value, lengthBytes, keepMarker=false clears
    * the length-descriptor bit — element SIZES; IDs keep it). Returns
    * null on truncation/invalid (length byte 0).
    */
  private final class Varint(val value: Long, val len: Int)
  private def varint(b: Array[Byte], i: Int, keepMarker: Boolean): Varint = {
    if (i >= b.length) return null
    val first = b(i) & 0xff
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 23 // 32-bit: 8-bit val
    if (i + len > b.length) return null
    var v: Long =
      if (keepMarker) first.toLong
      else first & ((1 << (8 - len)) - 1)
    var k = 1
    while (k < len) {
      v = (v << 8) | (b(i + k) & 0xff); k += 1
    }
    new Varint(v, len)
  }

  private def uint(b: Array[Byte], from: Int, until: Int): Long = {
    var v = 0L
    var i = from
    while (i < until) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private def float(b: Array[Byte], from: Int, until: Int): Double =
    (until - from) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, from, until).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, from, until))
      case _ => Double.NaN
    }

  /** Walk child elements of `[from, until)`: f(id, payloadFrom,
    * payloadUntil). Unknown-size elements (all size bits set) end the
    * walk (only Segment/Cluster legally carry them; handled by caller).
    */
  private def walk(b: Array[Byte], from: Long, until: Long)(
      f: (Long, Long, Long) => Unit): Unit = {
    var i = from
    while (i + 2 <= until) {
      val id = varint(b, i.toInt, keepMarker = true)
      if (id == null) return
      val sz = varint(b, (i + id.len).toInt, keepMarker = false)
      if (sz == null) return
      val payload = i + id.len + sz.len
      // all-ones size value = unknown (RFC 8794 §6): treat as to-end.
      val unknownBits = (1L << (7 * sz.len)) - 1
      val end = if (sz.value == unknownBits) until else payload + sz.value
      if (end < payload || end > until) return
      f(id.value, payload, end)
      i = end
    }
  }

  private def find(b: Array[Byte], from: Long, until: Long,
      id: Long): Option[(Long, Long)] = {
    var res: Option[(Long, Long)] = None
    walk(b, from, until)((i, f, u) => if (res.isEmpty && i == id) res = Some((f, u)))
    res
  }

  // Element ids (Matroska registry; full 'class' ids with marker bit).
  private val EBML = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B666L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val Block = 0xA1L
  private val ReferenceBlock = 0xFBL

  /** Parse; None unless the blob is EBML with a matroska/webm DocType
    * carrying a video track.
    */
  def parse(b: Array[Byte]): Option[Meta] = {
    if (b == null || b.length < 8) return None
    val (ef, eu) = find(b, 0, b.length.toLong, EBML).getOrElse(return None)
    val doctype = find(b, ef, eu, DocType)
      .map { case (f, u) => new String(b, f.toInt, (u - f).toInt, "US-ASCII") }
      .getOrElse(return None)
    if (doctype != "matroska" && doctype != "webm") return None
    // The EBML header is the FIRST element; Segment follows it.
    val (sf, su) = find(b, eu, b.length.toLong, Segment)
      .orElse(find(b, 0, b.length.toLong, Segment)).getOrElse(return None)

    var tsScale = 1000000L // default: 1 ms ticks
    var durTicks = Double.NaN
    find(b, sf, su, Info).foreach { case (f, u) =>
      walk(b, f, u) { (id, cf, cu) =>
        if (id == TimestampScale) tsScale = uint(b, cf.toInt, cu.toInt)
        else if (id == Duration) durTicks = float(b, cf.toInt, cu.toInt)
      }
    }
    var codec = ""
    var w = 0
    var h = 0
    var videoTrack = -1L
    find(b, sf, su, Tracks).foreach { case (f, u) =>
      walk(b, f, u) { (id, tf, tu) =>
        if (id == TrackEntry && videoTrack < 0) {
          var typ = 0L
          var num = 0L
          var c = ""
          var ww = 0
          var hh = 0
          walk(b, tf, tu) { (eid, cf, cu) =>
            if (eid == TrackType) typ = uint(b, cf.toInt, cu.toInt)
            else if (eid == TrackNumber) num = uint(b, cf.toInt, cu.toInt)
            else if (eid == CodecID)
              c = new String(b, cf.toInt, (cu - cf).toInt, "US-ASCII")
            else if (eid == Video) walk(b, cf, cu) { (vid, vf, vu) =>
              if (vid == PixelWidth) ww = uint(b, vf.toInt, vu.toInt).toInt
              else if (vid == PixelHeight) hh = uint(b, vf.toInt, vu.toInt).toInt
            }
          }
          if (typ == 1L && num > 0) { // 1 = video
            videoTrack = num; codec = c; w = ww; h = hh
          }
        }
      }
    }
    if (videoTrack < 0) return None
    // Frame/keyframe counts from the block stream of the video track.
    // Both block forms (Matroska §blocks): bare SimpleBlocks (keyframe
    // flag 0x80 in the block header) and BlockGroup/Block (keyframe =
    // the group carries NO ReferenceBlock). A laced block packs
    // multiple frames — lacing bits 0x06 of the flags byte; when set,
    // the byte after the flags is (frame count - 1) for ALL three
    // lacing modes, which is all counting needs (sizes are skipped
    // with the payload).
    def laceCount(bf: Long, bu: Long): Long = {
      val tn = varint(b, bf.toInt, keepMarker = false)
      if (tn == null || tn.value != videoTrack || bf + tn.len + 3 > bu) return 0L
      val flags = b((bf + tn.len + 2).toInt) & 0xff
      if ((flags & 0x06) == 0) 1L
      else if (bf + tn.len + 4 <= bu) (b((bf + tn.len + 3).toInt) & 0xff) + 1L
      else 0L
    }
    def blockFlags(bf: Long, bu: Long): Int = {
      val tn = varint(b, bf.toInt, keepMarker = false)
      if (tn == null || bf + tn.len + 3 > bu) 0
      else b((bf + tn.len + 2).toInt) & 0xff
    }
    var nFrames = 0L
    var nKey = 0L
    // scanCluster recurses on a nested Cluster id: an UNKNOWN-SIZE
    // cluster (live-muxed WebM — ffmpeg writes them when it cannot
    // seek back) walks as extending to the segment end, so every
    // following sibling cluster arrives as its "child"; recursing
    // counts their blocks instead of silently skipping them.
    def scanCluster(cf: Long, cu: Long): Unit = walk(b, cf, cu) { (bid, bf, bu) =>
      if (bid == SimpleBlock) {
        val n = laceCount(bf, bu)
        nFrames += n
        // Keyframe flag: "this block contains only keyframes".
        if (n > 0 && (blockFlags(bf, bu) & 0x80) != 0) nKey += n
      } else if (bid == BlockGroup) {
        var ref = false
        var n = 0L
        walk(b, bf, bu) { (gid, gf, gu) =>
          if (gid == Block) n += laceCount(gf, gu)
          else if (gid == ReferenceBlock) ref = true
        }
        nFrames += n
        if (!ref) nKey += n // no reference = I-frames (Matroska §BlockGroup)
      } else if (bid == Cluster) scanCluster(bf, bu)
    }
    walk(b, sf, su)((id, cf, cu) => if (id == Cluster) scanCluster(cf, cu))
    val durationMs =
      if (durTicks.isNaN || tsScale <= 0) 0L
      else (durTicks * tsScale / 1e6).toLong
    val fmt = if (doctype == "webm") "webm" else "mkv"
    Some(Meta(fmt, codec, w, h, durationMs, nFrames, nKey))
  }

  /** struct(format, codec, width, height, duration_ms, n_frames,
    * n_keyframes), null for non-Matroska blobs (quarantine rule).
    */
  def mkvMeta(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      parse(b).map(m => (m.format, m.codec, m.width, m.height,
        m.durationMs, m.nFrames, m.nKeyframes))
    }
    f(blob).cast("struct<format:string,codec:string,width:int,height:int," +
      "duration_ms:bigint,n_frames:bigint,n_keyframes:bigint>")
  }
}
