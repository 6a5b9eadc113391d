package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real image-header decoding from a binary column's LEADING BYTES —
  * PNG / JPEG / GIF / BMP / WebP / TIFF geometry and channel count
  * without decoding a single pixel (all six are public container
  * formats; parsing uses nothing beyond the JDK). This is the production on-ramp for
  * [[Multimodal.aspectBuckets]] / [[Multimodal.resizePlan]]: when a
  * corpus carries actual media blobs, their width/height come from
  * here; the synthetic path stays for the DuckDB oracle gate (an
  * oracle cannot parse JPEG markers).
  *
  * Scale shape: a narrow per-row map over the blob column — no
  * shuffle, no pixel buffers, and only the header region is touched
  * (JPEG marker walk stops at the first SOF). The full-pixel decode /
  * resample remains the documented stub boundary
  * ([[Multimodal]] scaladoc); `javax.imageio` could supply it
  * executor-locally where pixels are genuinely needed.
  */
object ImageHeader {

  /** (format, width, height, channels) parsed from leading bytes. */
  final case class Meta(format: String, width: Int, height: Int, channels: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def i32le(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
      ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first
    * (PNG spec §5.6): width/height as big-endian u32 at offsets 16/20,
    * bit depth at 24, color type at 25.
    */
  private def png(b: Array[Byte]): Option[Meta] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length < 26 || !sig.indices.forall(i => (b(i) & 0xff) == sig(i)))
      return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = u32be(b, 16); val h = u32be(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val channels = (b(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolour
      case 3 => 3 // palette (indices resolve to RGB)
      case 4 => 2 // greyscale + alpha
      case 6 => 4 // truecolour + alpha
      case _ => return None
    }
    Some(Meta("png", w.toInt, h.toInt, channels))
  }

  /** JPEG: walk the marker stream from SOI to the first frame header
    * (SOF0–SOF15 minus DHT/DAC/JPG): precision(1) height(2) width(2)
    * components(1) follow the segment length (ITU T.81 §B.2.2).
    */
  private def jpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced marker stream
      var j = i
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
      if (j + 1 >= b.length) return None // stream ends in a 0xFF run
      val marker = b(j + 1) & 0xff
      i = j + 2
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        // standalone (SOI / TEM / RSTn): no length field (T.81 §B.1.1.3)
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF: no geometry
      } else {
        if (i + 1 >= b.length) return None
        val len = u16be(b, i)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 7 >= b.length) return None
          val h = u16be(b, i + 3); val w = u16be(b, i + 5)
          val ncomp = b(i + 7) & 0xff
          if (w <= 0 || h <= 0 || ncomp <= 0) return None
          return Some(Meta("jpeg", w, h, ncomp))
        }
        i += len
      }
    }
    None
  }

  /** GIF87a/GIF89a: logical-screen width/height as little-endian u16
    * at offsets 6/8; pixels resolve through an RGB color table.
    */
  private def gif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 10) return None
    val hdr = new String(b, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w <= 0 || h <= 0) None else Some(Meta("gif", w, h, 3))
  }

  /** BMP ("BM" + DIB header). The DIB header SIZE at offset 14 picks
    * the layout: BITMAPINFOHEADER and successors (>= 40 bytes) store
    * width/height as little-endian i32 at 18/22 (height may be
    * negative for top-down rows) and bits/pixel at 28; the OS/2
    * BITMAPCOREHEADER (size 12) stores width/height as u16 at 18/20
    * and bits/pixel at 24 — reading it with the info-header offsets
    * would silently yield garbage geometry.
    */
  private def bmp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    i32le(b, 14) match {
      case 12 =>
        val w = u16le(b, 18); val h = u16le(b, 20)
        val bpp = u16le(b, 24)
        if (w <= 0 || h <= 0 || bpp <= 0) None
        else Some(Meta("bmp", w, h, math.max(1, bpp / 8)))
      case size if size >= 40 =>
        if (b.length < 30) return None
        val w = i32le(b, 18); val h = math.abs(i32le(b, 22))
        val bpp = u16le(b, 28)
        if (w <= 0 || h <= 0 || bpp <= 0) None
        else Some(Meta("bmp", w, h, math.max(1, bpp / 8)))
      case _ => None // unknown DIB layout: refuse rather than misparse
    }
  }

  /** WebP (RIFF 'WEBP', one of three first-chunk layouts):
    *  - 'VP8 ' lossy: key-frame start code 9D 01 2A then 14-bit LE
    *    width/height (RFC 6386 §9.1) — always 3 channels (YUV).
    *  - 'VP8L' lossless: 0x2F signature then a 32-bit LE field packing
    *    width-1 (14 bits), height-1 (14 bits), alpha-is-used (1 bit).
    *  - 'VP8X' extended: flags byte (alpha = 0x10), 3 reserved bytes,
    *    then canvas width-1 / height-1 as u24le.
    */
  private def webp(b: Array[Byte]): Option[Meta] = {
    if (b.length < 25 || // smallest parseable layout (VP8L header)
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'))
      return None
    val p = 20 // first chunk's payload (RIFF hdr 12 + fourcc 4 + size 4)
    new String(b, 12, 4, "US-ASCII") match {
      case "VP8 " =>
        if (b.length < 30 ||
          (b(p + 3) & 0xff) != 0x9d || (b(p + 4) & 0xff) != 0x01 ||
          (b(p + 5) & 0xff) != 0x2a) None
        else {
          val w = u16le(b, p + 6) & 0x3fff
          val h = u16le(b, p + 8) & 0x3fff
          if (w <= 0 || h <= 0) None else Some(Meta("webp", w, h, 3))
        }
      case "VP8L" =>
        if ((b(p) & 0xff) != 0x2f) None
        else {
          val bits = i32le(b, p + 1)
          val w = (bits & 0x3fff) + 1
          val h = ((bits >>> 14) & 0x3fff) + 1
          Some(Meta("webp", w, h, if (((bits >>> 28) & 1) == 1) 4 else 3))
        }
      case "VP8X" =>
        if (b.length < 30) return None
        val flags = b(p) & 0xff
        val w = ((b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8) |
          ((b(p + 6) & 0xff) << 16)) + 1
        val h = ((b(p + 7) & 0xff) | ((b(p + 8) & 0xff) << 8) |
          ((b(p + 9) & 0xff) << 16)) + 1
        Some(Meta("webp", w, h, if ((flags & 0x10) != 0) 4 else 3))
      case _ => None
    }
  }

  /** TIFF (II/MM byte-order mark + magic 42): walk the first IFD's
    * entries for ImageWidth (256), ImageLength (257), SamplesPerPixel
    * (277, default 1). Inline values only — SHORT reads the first two
    * bytes of the value field (left-justified in big-endian files per
    * TIFF 6.0 §2), LONG all four; geometry tags are inline in any
    * writer that exists. Unknown tags skip; a truncated IFD refuses.
    */
  private def tiff(b: Array[Byte]): Option[Meta] = {
    if (b.length < 8) return None
    val le = b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0
    val be = b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42
    if (!le && !be) return None
    def u16(i: Int): Int = if (le) u16le(b, i) else u16be(b, i)
    def u32(i: Int): Long =
      if (le) i32le(b, i).toLong & 0xffffffffL else u32be(b, i)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    var w = 0L; var h = 0L; var spp = 1L
    var k = 0
    while (k < n) {
      val e = ifd.toInt + 2 + 12 * k
      if (e + 12 > b.length) return None
      val v: Long = u16(e + 2) match {
        case 3 => u16(e + 8).toLong
        case 4 => u32(e + 8)
        case _ => -1L
      }
      u16(e) match {
        case 256 => w = v
        case 257 => h = v
        case 277 => spp = v
        case _   =>
      }
      k += 1
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Meta("tiff", w.toInt, h.toInt, math.max(1, spp.toInt)))
  }

  /** Orientation tag (EXIF/TIFF tag 274) of the TIFF stream whose
    * header starts at `base`: IFD0 walk only — orientation is an
    * IFD0 attribute (EXIF 2.3 §4.6.4), never in Exif-sub or GPS IFDs.
    * 1..8 per the spec; None for absent/corrupt.
    */
  private def tiffOrientation(b: Array[Byte], base: Int): Option[Int] = {
    if (base + 8 > b.length) return None
    val le = b(base) == 'I' && b(base + 1) == 'I' &&
      (b(base + 2) & 0xff) == 42 && b(base + 3) == 0
    val be = b(base) == 'M' && b(base + 1) == 'M' && b(base + 2) == 0 &&
      (b(base + 3) & 0xff) == 42
    if (!le && !be) return None
    def u16(i: Int): Int = if (le) u16le(b, i) else u16be(b, i)
    def u32(i: Int): Long =
      if (le) i32le(b, i).toLong & 0xffffffffL else u32be(b, i)
    val ifd = u32(base + 4) // relative to the TIFF header
    if (ifd < 8 || base + ifd + 2 > b.length) return None
    val ifd0 = base + ifd.toInt
    val n = u16(ifd0)
    var k = 0
    while (k < n) {
      val e = ifd0 + 2 + 12 * k
      if (e + 12 > b.length) return None
      if (u16(e) == 274 && u16(e + 2) == 3) {
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) Some(v) else None
      }
      k += 1
    }
    None
  }

  /** EXIF orientation (1..8) of a JPEG (APP1 "Exif\0\0" segment,
    * orientation tag in the embedded TIFF's IFD0) or a bare TIFF.
    * None = no EXIF / no orientation tag / not one of these formats —
    * which by EXIF convention means orientation 1 (no transform);
    * [[orientedMeta]] applies that default. Header-bounded like every
    * parser here: the JPEG walk stops at SOS.
    */
  def exifOrientation(b: Array[Byte]): Option[Int] = {
    if (b == null || b.length < 4) return None
    // Bare TIFF (incl. the TIFF arm of parse()).
    if ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
      return tiffOrientation(b, 0)
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      var j = i
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
      if (j + 1 >= b.length) return None
      val marker = b(j + 1) & 0xff
      i = j + 2
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        // standalone markers: no length
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / scan data: no EXIF ahead
      } else {
        if (i + 1 >= b.length) return None
        val len = u16be(b, i)
        if (len < 2) return None
        if (marker == 0xe1 && len >= 10 && i + 8 <= b.length &&
          b(i + 2) == 'E' && b(i + 3) == 'x' && b(i + 4) == 'i' &&
          b(i + 5) == 'f' && b(i + 6) == 0 && b(i + 7) == 0)
          return tiffOrientation(b, i + 8)
        i += len
      }
    }
    None
  }

  /** [[imageMeta]] plus display geometry: struct(format, width,
    * height, channels, orientation, display_width, display_height).
    * Orientations 5-8 are the transposed quadrant (90°/270° rotations
    * — EXIF 2.3 §4.6.4), so display dims swap; absent orientation
    * defaults to 1. This is the on-ramp for aspect-ratio curation
    * over phone-camera corpora, where the SENSOR geometry in the SOF
    * header routinely disagrees with the display geometry.
    */
  def orientedMeta(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      parse(b).map { m =>
        val o = exifOrientation(b).getOrElse(1)
        val (dw, dh) = if (o >= 5) (m.height, m.width) else (m.width, m.height)
        (m.format, m.width, m.height, m.channels, o, dw, dh)
      }
    }
    f(blob).cast("struct<format:string,width:int,height:int,channels:int," +
      "orientation:int,display_width:int,display_height:int>")
  }

  /** Parse the leading bytes; None for null/unknown/corrupt blobs. */
  def parse(bytes: Array[Byte]): Option[Meta] =
    if (bytes == null) None
    else png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes)).orElse(bmp(bytes))
      .orElse(webp(bytes)).orElse(tiff(bytes))

  /** Column form: a struct(format, width, height, channels), null when
    * the blob is not a recognized image. A UDF is the right tool here —
    * byte-level marker walking has no builtin, and the per-row work is
    * a bounded header scan, not a pixel decode.
    */
  def imageMeta(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      parse(b).map(m => (m.format, m.width, m.height, m.channels))
    }
    f(blob).cast("struct<format:string,width:int,height:int,channels:int>")
  }

  /** Deterministic BMP synthesis (BITMAPINFOHEADER, 24 bpp, rows
    * 4-byte padded) — the image member of the media fixture family
    * ([[VideoFixtures]]): real spec-conformant bytes from integer
    * parameters, so mixed-media routing gates can compute expected
    * parse output as pure arithmetic.
    */
  def bmpFixture(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (3 * width + 3) & ~3
    val dataSize = rowSize * height
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until height).foreach { y =>
      (0 until rowSize).foreach(x => out.put(((x * 31 + y * 7) & 0xff).toByte))
    }
    out.array()
  }

  /** A real baseline JPEG ([[VideoFixtures.solidJpeg]]) with an EXIF
    * APP1 segment spliced after SOI: TIFF header (big-endian) + IFD0
    * carrying only the orientation tag — the [[exifOrientation]] gate
    * fixture. Spec shape per EXIF 2.3 §4.5.4 (APP1 = "Exif\0\0" +
    * TIFF stream; tag offsets relative to the TIFF header).
    */
  def exifJpegFixture(width: Int, height: Int, orientation: Int,
      rgb: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8)
    val jpeg = VideoFixtures.solidJpeg(width, height, rgb)
    // TIFF stream: MM, 42, IFD at +8; 1 entry (tag 274, SHORT, count 1,
    // value in-place), next-IFD 0.
    val tiffLen = 8 + 2 + 12 + 4
    val seg = java.nio.ByteBuffer.allocate(4 + 6 + tiffLen)
    seg.put(0xff.toByte).put(0xe1.toByte)
      .putShort((2 + 6 + tiffLen).toShort) // length incl. itself
      .put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    seg.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    seg.putShort(1) // entry count
    seg.putShort(274).putShort(3).putInt(1)
      .putShort(orientation.toShort).putShort(0)
    seg.putInt(0) // next IFD
    val out = new java.io.ByteArrayOutputStream(jpeg.length + seg.position())
    out.write(jpeg, 0, 2) // SOI
    out.write(seg.array(), 0, seg.position())
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** A header-only TIFF (no strip data — [[parse]] and
    * [[exifOrientation]] read tags only): geometry, samples-per-pixel,
    * and orientation in one IFD, little-endian.
    */
  def tiffFixture(width: Int, height: Int, orientation: Int,
      spp: Int = 3): Array[Byte] = {
    require(width > 0 && height > 0 && orientation >= 1 && orientation <= 8)
    val out = java.nio.ByteBuffer.allocate(8 + 2 + 4 * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    out.putShort(4)
    def entry(tag: Int, v: Int): Unit =
      out.putShort(tag.toShort).putShort(3).putInt(1)
        .putShort(v.toShort).putShort(0)
    entry(256, width); entry(257, height)
    entry(274, orientation); entry(277, spp)
    out.putInt(0)
    out.array()
  }

  /** [[Multimodal.mediaSchema]]-shaped frame from REAL bytes: doc_id,
    * media, and header-derived format/width/height (null metadata rows
    * — unrecognized blobs — are kept with format null so callers can
    * route them to quarantine; [[Multimodal.aspectBuckets]] and
    * [[Multimodal.resizePlan]] already exclude non-positive dims).
    */
  def fromBinary(df: DataFrame, idCol: String = "doc_id",
      blobCol: String = "media"): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        col(blobCol).as("media"), imageMeta(col(blobCol)).as("m"))
      .select(col("doc_id"), col("media"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.channels").as("channels"))
}
