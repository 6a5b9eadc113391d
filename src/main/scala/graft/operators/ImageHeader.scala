package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real image-header decoding from a binary column's LEADING BYTES —
  * PNG / JPEG / GIF / BMP geometry and channel count without decoding
  * a single pixel (all four are public container formats; parsing uses
  * nothing beyond the JDK). This is the production on-ramp for
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

  /** Parse the leading bytes; None for null/unknown/corrupt blobs. */
  def parse(bytes: Array[Byte]): Option[Meta] =
    if (bytes == null) None
    else png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes)).orElse(bmp(bytes))

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
