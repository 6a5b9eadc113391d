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
  private val CodecPrivate = 0x63A2L
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B666L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val Block = 0xA1L
  private val ReferenceBlock = 0xFBL

  /** Everything before the block scan: doctype, Info arithmetic, and
    * the first video track's identity — shared by [[parse]] and
    * [[codecRanges]].
    */
  private final class Ctx(val fmt: String, val codec: String, val width: Int,
      val height: Int, val durationMs: Long, val sf: Long, val su: Long,
      val videoTrack: Long)

  private def ctx(b: Array[Byte]): Ctx = {
    if (b == null || b.length < 8) return null
    val (ef, eu) = find(b, 0, b.length.toLong, EBML).getOrElse(return null)
    val doctype = find(b, ef, eu, DocType)
      .map { case (f, u) => new String(b, f.toInt, (u - f).toInt, "US-ASCII") }
      .getOrElse(return null)
    if (doctype != "matroska" && doctype != "webm") return null
    // The EBML header is the FIRST element; Segment follows it.
    val (sf, su) = find(b, eu, b.length.toLong, Segment)
      .orElse(find(b, 0, b.length.toLong, Segment)).getOrElse(return null)

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
    if (videoTrack < 0) return null
    val durationMs =
      if (durTicks.isNaN || tsScale <= 0) 0L
      else (durTicks * tsScale / 1e6).toLong
    new Ctx(if (doctype == "webm") "webm" else "mkv", codec, w, h,
      durationMs, sf, su, videoTrack)
  }

  /** One video-track block's header facts. `laceMode`: 0 none, 1 Xiph,
    * 2 fixed-size, 3 EBML (flags bits 0x06). `payFrom` points past the
    * header AND the lace-count byte when laced — i.e. at the lace size
    * table (Xiph/EBML) or the first frame byte (none/fixed).
    */
  private final class BlockHdr(val frames: Long, val key: Boolean,
      val laceMode: Int, val payFrom: Long)

  private def blockHdr(b: Array[Byte], bf: Long, bu: Long,
      videoTrack: Long): BlockHdr = {
    val tn = varint(b, bf.toInt, keepMarker = false)
    if (tn == null || tn.value != videoTrack || bf + tn.len + 3 > bu)
      return null
    val flags = b((bf + tn.len + 2).toInt) & 0xff
    val laceMode = (flags & 0x06) >> 1
    if (laceMode == 0)
      new BlockHdr(1L, (flags & 0x80) != 0, 0, bf + tn.len + 3)
    else if (bf + tn.len + 4 <= bu)
      new BlockHdr((b((bf + tn.len + 3).toInt) & 0xff) + 1L,
        (flags & 0x80) != 0, laceMode, bf + tn.len + 4)
    else null
  }

  /** The block-stream scan both consumers share: `f` sees every video
    * block with its group-level keyframe-ness resolved (SimpleBlock:
    * header flag; BlockGroup/Block: no ReferenceBlock sibling) and the
    * block's payload end. Nested Cluster ids descend in stream order:
    * an UNKNOWN-SIZE cluster (live-muxed WebM — ffmpeg writes them
    * when it cannot seek back) walks as extending to the segment end,
    * so every following sibling cluster arrives as its "child";
    * descending counts their blocks instead of silently skipping them.
    *
    * The descent is an explicit resume stack, NOT recursion: N
    * sequential unknown-size clusters (or a crafted ~5-byte-per-level
    * nest) would otherwise recurse N deep and overflow the thread
    * stack — a task failure where the malformed-blob contract demands
    * a quarantine. Unknown-size clusters push NO frame (their span IS
    * the parent's remainder, so the resume point is empty); known-size
    * nests are heap-bounded and capped at [[MaxClusterDepth]], beyond
    * which deeper blocks are skipped (only crafted data nests that
    * far) and what was counted so far stands.
    */
  private val MaxClusterDepth = 4096

  private def scanVideoBlocks(b: Array[Byte], c: Ctx)(
      f: (BlockHdr, Boolean, Long) => Unit): Unit = {
    def blockElem(bid: Long, bf: Long, bu: Long): Unit = {
      if (bid == SimpleBlock) {
        val h = blockHdr(b, bf, bu, c.videoTrack)
        // Keyframe flag: "this block contains only keyframes".
        if (h != null) f(h, h.key, bu)
      } else if (bid == BlockGroup) {
        var ref = false
        val hs = Array.newBuilder[(BlockHdr, Long)]
        walk(b, bf, bu) { (gid, gf, gu) =>
          if (gid == Block) {
            val h = blockHdr(b, gf, gu, c.videoTrack)
            if (h != null) hs += ((h, gu))
          } else if (gid == ReferenceBlock) ref = true
        }
        // No reference = I-frames (Matroska §BlockGroup).
        hs.result().foreach { case (h, gu) => f(h, !ref, gu) }
      }
    }
    // Manual cursor over the current element span; `stack` holds the
    // parents' resume points. inCluster=false is the top-level Segment
    // walk, which only descends into Cluster ids (blocks never sit
    // directly under Segment).
    val stack = new java.util.ArrayDeque[Array[Long]]()
    var cur = c.sf
    var end = c.su
    var inCluster = false
    var done = false
    while (!done) {
      if (cur + 2 > end) {
        if (stack.isEmpty) done = true
        else {
          val fr = stack.pop()
          cur = fr(0); end = fr(1); inCluster = fr(2) == 1L
        }
      } else {
        val id = varint(b, cur.toInt, keepMarker = true)
        val sz = if (id == null) null
          else varint(b, (cur + id.len).toInt, keepMarker = false)
        if (sz == null) cur = end // malformed: end this span's walk
        else {
          val payload = cur + id.len + sz.len
          val unknownBits = (1L << (7 * sz.len)) - 1
          val pend = if (sz.value == unknownBits) end else payload + sz.value
          if (pend < payload || pend > end) cur = end
          else if (id.value == Cluster && stack.size < MaxClusterDepth) {
            // Descend in order; resume the parent after the cluster
            // span. An unknown-size cluster consumes the remainder
            // (pend == end) — its resume frame would be empty, skip it.
            if (pend < end) stack.push(Array(pend, end, if (inCluster) 1L else 0L))
            cur = payload; end = pend; inCluster = true
          } else {
            if (inCluster) blockElem(id.value, payload, pend)
            cur = pend
          }
        }
      }
    }
  }

  /** Parse; None unless the blob is EBML with a matroska/webm DocType
    * carrying a video track. Frame/keyframe counts come from the block
    * stream — both block forms, laced blocks at their packed count.
    */
  def parse(b: Array[Byte]): Option[Meta] = {
    val c = ctx(b)
    if (c == null) return None
    var nFrames = 0L
    var nKey = 0L
    scanVideoBlocks(b, c) { (h, key, _) =>
      nFrames += h.frames
      if (key) nKey += h.frames
    }
    Some(Meta(c.fmt, c.codec, c.width, c.height, c.durationMs, nFrames, nKey))
  }

  /** Codec id + the first video track's CodecPrivate bytes (element
    * 0x63A2 — for `V_MPEG4/ISO/AVC` / `V_MPEGH/ISO/HEVC` tracks the
    * SAME avcC/hvcC record BMFF carries, RFC 9559 §4.2.2), so
    * [[CodecConfig.parseRecord]] yields header-exact stream facts for
    * Matroska too. None when the track ships none (V_MJPEG-class).
    */
  def codecPrivate(b: Array[Byte]): Option[(String, Array[Byte])] = {
    val c = ctx(b)
    if (c == null) return None
    var res: Option[(String, Array[Byte])] = None
    find(b, c.sf, c.su, Tracks).foreach { case (f, u) =>
      walk(b, f, u) { (id, tf, tu) =>
        if (id == TrackEntry && res.isEmpty) {
          var num = -1L
          var priv: Array[Byte] = null
          walk(b, tf, tu) { (eid, cf, cu) =>
            if (eid == TrackNumber) num = uint(b, cf.toInt, cu.toInt)
            else if (eid == CodecPrivate)
              priv = java.util.Arrays.copyOfRange(b, cf.toInt, cu.toInt)
          }
          if (num == c.videoTrack && priv != null)
            res = Some((c.codec, priv))
        }
      }
    }
    res
  }

  /** Codec id + KEYFRAME byte ranges from one scan — the Matroska
    * sibling of [[VideoContainer.codecRanges]], which is what lets
    * [[graft.operators.Multimodal.decodeKeyframes]] rasterize
    * `V_MJPEG` tracks (each frame a standalone JPEG). Sample numbers
    * are 1-based ordinals over the track's whole frame stream. Ranges
    * resolve for unlaced blocks (one frame = the block payload) and
    * fixed-size lacing (equal split); Xiph/EBML-laced KEYFRAME blocks
    * still count frames but emit no ranges — video keyframes are not
    * laced by any known muxer, and guessing offsets without parsing
    * the size table would slice garbage into the decoder.
    */
  def codecRanges(b: Array[Byte],
      codecGate: String => Boolean = _ => true)
      : Option[(String, Array[VideoContainer.KeyframeRange])] = {
    val c = ctx(b)
    if (c == null) return None
    // The codec id is known BEFORE any cluster walk — an undecodable
    // codec returns immediately with empty ranges rather than paying
    // a full block-stream scan the caller will discard.
    if (!codecGate(c.codec))
      return Some((c.codec, Array.empty[VideoContainer.KeyframeRange]))
    val out = Array.newBuilder[VideoContainer.KeyframeRange]
    var ord = 0L
    scanVideoBlocks(b, c) { (h, key, bu) =>
      if (!key) ord += h.frames
      else h.laceMode match {
        case 0 =>
          ord += 1
          out += VideoContainer.KeyframeRange(ord.toInt, h.payFrom,
            bu - h.payFrom)
        case 2 =>
          // Fixed-size lacing: equal frames; refuse a non-dividing
          // payload (corrupt) rather than emit misaligned slices.
          val total = bu - h.payFrom
          if (h.frames > 0 && total % h.frames == 0) {
            val sz = total / h.frames
            var k = 0L
            while (k < h.frames) {
              ord += 1
              out += VideoContainer.KeyframeRange(ord.toInt,
                h.payFrom + k * sz, sz)
              k += 1
            }
          } else ord += h.frames
        case _ => ord += h.frames // Xiph/EBML lace table not parsed
      }
    }
    Some((c.codec, out.result()))
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
