package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Codec-configuration parsing — header-EXACT stream properties for
  * the modern codecs whose SAMPLE decode stays stubbed (no AVC/HEVC
  * decoder ships in the JDK): profile, level, bit depth, chroma
  * format, and the CODED picture geometry with conformance cropping
  * applied, read from the `avcC` / `hvcC` decoder-configuration
  * records that BMFF carries inside the `stsd` visual sample entry
  * (ISO/IEC 14496-15 §5.3.3.1 / §8.3.3.1) and Matroska carries as
  * `CodecPrivate` (RFC 9559 §4: the same record bytes).
  *
  * This shrinks the documented codec-stub boundary from "everything
  * about AVC/HEVC" to "sample RASTERIZATION only": a curation pipeline
  * filters on profile/level/bit-depth/true-geometry (drop 10-bit,
  * drop >level-4.1, bucket by coded size) without any codec library,
  * because those facts live in the SPS — a few dozen bytes of
  * exp-Golomb the container hands over before any frame is touched
  * (ITU-T H.264 §7.3.2.1.1, ITU-T H.265 §7.3.2.2).
  *
  * Scale shape: narrow per-row map reading only the stsd region the
  * container parse already walks; malformed records yield null
  * (quarantine rule of the media family, [[ImageHeader.parse]]).
  */
object CodecConfig {

  /** Header-exact stream facts. `codedWidth/Height` are the cropped
    * conformance-window dimensions — the TRUE picture size, which for
    * non-multiple-of-16 content differs from the container's rounded
    * tkhd geometry. `chromaFormat` is the idc (0=mono, 1=4:2:0,
    * 2=4:2:2, 3=4:4:4); `bitDepth` is luma.
    */
  final case class Profile(codec: String, profileIdc: Int, levelIdc: Int,
      bitDepth: Int, chromaFormat: Int, codedWidth: Int, codedHeight: Int)

  // ---- RBSP bit reader --------------------------------------------------

  /** MSB-first bit reader over an RBSP (emulation-prevention bytes
    * 00 00 03 already stripped). Reads past the end throw — callers
    * wrap in the quarantine Try.
    */
  private final class Bits(b: Array[Byte]) {
    private var pos = 0 // bit position
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val byte = pos >> 3
        if (byte >= b.length) throw new IndexOutOfBoundsException
        v = (v << 1) | ((b(byte) >> (7 - (pos & 7))) & 1)
        pos += 1; k += 1
      }
      v
    }
    /** Exp-Golomb ue(v), H.264 §9.1: leadingZeroBits zeros, a 1, then
      * leadingZeroBits info bits; value = 2^lz − 1 + info. Bounded at
      * 31 leading zeros — a run beyond that is corrupt by any real
      * SPS's lights and would overflow Int anyway.
      */
    def ue(): Int = {
      var lz = 0
      while (u(1) == 0) {
        lz += 1
        // > 30 would overflow Int ((1 << 31) is negative); no field a
        // profile parser reads is anywhere near 2^31.
        if (lz > 30) throw new IllegalArgumentException("ue overflow")
      }
      (1 << lz) - 1 + (if (lz == 0) 0 else u(lz))
    }
    /** se(v): mapped from ue per §9.1.1 — k → (−1)^(k+1)·ceil(k/2). */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip emulation-prevention bytes: 00 00 03 → 00 00 (H.264 §7.4.1,
    * same mechanism in H.265).
    */
  private def rbsp(b: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    var zeros = 0
    while (i < until) {
      val v = b(i) & 0xff
      if (zeros >= 2 && v == 3) { zeros = 0 } // skip the EP byte
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- H.264 SPS --------------------------------------------------------

  /** The profiles whose SPS carries the chroma/bit-depth block
    * (H.264 §7.3.2.1.1 — the "high" family).
    */
  private val AvcHighProfiles = Set(100, 110, 122, 244, 44, 83, 86,
    118, 128, 138, 139, 134, 135)

  /** Parse an H.264 sequence parameter set NAL (header byte included).
    * Returns null-safe None on any malformed structure.
    */
  def parseAvcSps(nal: Array[Byte]): Option[Profile] = {
    if (nal == null || nal.length < 4) return None
    if ((nal(0) & 0x1f) != 7) return None // nal_unit_type SPS
    try {
      val r = new Bits(rbsp(nal, 1, nal.length))
      val profileIdc = r.u(8)
      r.u(8) // constraint_set flags + reserved
      val levelIdc = r.u(8)
      r.ue() // seq_parameter_set_id
      var chroma = 1
      var bitDepth = 8
      if (AvcHighProfiles.contains(profileIdc)) {
        chroma = r.ue()
        // Domain gates (§7.4.2.1.1): chroma_format_idc 0-3,
        // bit_depth_*_minus8 0-6 — an out-of-range decode means the
        // bitstream is corrupt and EVERY later field is garbage;
        // quarantine, don't emit plausible-looking junk facts.
        if (chroma > 3) return None
        if (chroma == 3) r.u(1) // separate_colour_plane_flag
        val bdl = r.ue() // bit_depth_luma_minus8
        if (bdl > 6) return None
        bitDepth = 8 + bdl
        if (r.ue() > 6) return None // bit_depth_chroma_minus8
        r.u(1) // qpprime_y_zero_transform_bypass_flag
        if (r.u(1) == 1) { // seq_scaling_matrix_present_flag
          val lists = if (chroma == 3) 12 else 8
          var i = 0
          while (i < lists) {
            if (r.u(1) == 1) { // seq_scaling_list_present_flag[i]
              // scaling_list(): sizes 16 for i<6 else 64 (§7.3.2.1.1.1)
              val size = if (i < 6) 16 else 64
              var lastScale = 8; var nextScale = 8
              var j = 0
              while (j < size) {
                if (nextScale != 0)
                  nextScale = (lastScale + r.se() + 256) % 256
                if (nextScale != 0) lastScale = nextScale
                j += 1
              }
            }
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      val pocType = r.ue()
      if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
      else if (pocType == 1) {
        r.u(1); r.se(); r.se()
        val n = r.ue() // num_ref_frames_in_pic_order_cnt_cycle
        if (n > 255) return None
        var i = 0
        while (i < n) { r.se(); i += 1 }
      }
      r.ue() // max_num_ref_frames
      r.u(1) // gaps_in_frame_num_value_allowed_flag
      val widthMbs = r.ue() + 1
      val heightMapUnits = r.ue() + 1
      val frameMbsOnly = r.u(1)
      if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
      r.u(1) // direct_8x8_inference_flag
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u(1) == 1) { // frame_cropping_flag
        cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      }
      // Crop units (§7.4.2.1.1): ChromaArrayType 0/3 → unit 1 (×
      // frame-height factor); 4:2:0 → 2×2; 4:2:2 → 2×1.
      val subW = if (chroma == 1 || chroma == 2) 2 else 1
      val subH = if (chroma == 1) 2 else 1
      val cropUnitX = subW
      val cropUnitY = subH * (2 - frameMbsOnly)
      val w = widthMbs * 16 - cropUnitX * (cl + cr)
      val h = (2 - frameMbsOnly) * heightMapUnits * 16 - cropUnitY * (ct + cb)
      if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16)) None
      else Some(Profile("avc1", profileIdc, levelIdc, bitDepth, chroma, w, h))
    } catch { case _: Exception => None }
  }

  /** AVCDecoderConfigurationRecord (14496-15 §5.3.3.1): version,
    * profile/compat/level, lengthSize, then SPS NALs as (u16 len,
    * bytes). The first SPS is authoritative for stream properties.
    */
  def parseAvcC(b: Array[Byte], from: Int, until: Int): Option[Profile] = {
    if (b == null || until - from < 7) return None
    if ((b(from) & 0xff) != 1) return None // configurationVersion
    val numSps = b(from + 5) & 0x1f
    if (numSps < 1) return None
    val lenOff = from + 6
    if (lenOff + 2 > until) return None
    val spsLen = ((b(lenOff) & 0xff) << 8) | (b(lenOff + 1) & 0xff)
    val spsFrom = lenOff + 2
    if (spsFrom + spsLen > until) return None
    parseAvcSps(java.util.Arrays.copyOfRange(b, spsFrom, spsFrom + spsLen))
  }

  // ---- H.265 SPS --------------------------------------------------------

  /** Parse an H.265 SPS NAL (2-byte header included, nal_unit_type 33).
    * Reads through the conformance window and bit depths — everything
    * after is irrelevant to stream properties and left unread.
    */
  def parseHevcSps(nal: Array[Byte]): Option[Profile] = {
    if (nal == null || nal.length < 6) return None
    if (((nal(0) & 0x7e) >> 1) != 33) return None
    try {
      val r = new Bits(rbsp(nal, 2, nal.length))
      r.u(4) // sps_video_parameter_set_id
      val maxSubLayers = r.u(3) // sps_max_sub_layers_minus1
      r.u(1) // sps_temporal_id_nesting_flag
      // profile_tier_level(1, maxSubLayers) — §7.3.3:
      r.u(2) // general_profile_space
      r.u(1) // general_tier_flag
      val profileIdc = r.u(5)
      r.u(32) // general_profile_compatibility_flags
      r.u(32); r.u(16) // 48 bits of constraint/reserved flags
      val levelIdc = r.u(8)
      // sub-layer presence flags + alignment + per-sublayer PTL
      if (maxSubLayers > 0) {
        val profPresent = new Array[Int](maxSubLayers)
        val levelPresent = new Array[Int](maxSubLayers)
        var i = 0
        while (i < maxSubLayers) {
          profPresent(i) = r.u(1); levelPresent(i) = r.u(1); i += 1
        }
        var j = maxSubLayers
        while (j < 8) { r.u(2); j += 1 } // reserved_zero_2bits
        i = 0
        while (i < maxSubLayers) {
          if (profPresent(i) == 1) { r.u(32); r.u(32); r.u(24) } // 88 bits
          if (levelPresent(i) == 1) r.u(8)
          i += 1
        }
      }
      r.ue() // sps_seq_parameter_set_id
      val chroma = r.ue()
      if (chroma > 3) return None // §7.4.3.2.1 domain; corrupt otherwise
      if (chroma == 3) r.u(1) // separate_colour_plane_flag
      val picW = r.ue() // pic_width_in_luma_samples
      val picH = r.ue()
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u(1) == 1) { // conformance_window_flag
        cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      }
      val bdl = r.ue() // bit_depth_luma_minus8 (0-8, §7.4.3.2.1)
      if (bdl > 8) return None
      val bitDepth = 8 + bdl
      if (r.ue() > 8) return None // bit_depth_chroma_minus8
      // Window offsets are in chroma units (§7.4.3.2.1).
      val subW = if (chroma == 1 || chroma == 2) 2 else 1
      val subH = if (chroma == 1) 2 else 1
      val w = picW - subW * (cl + cr)
      val h = picH - subH * (ct + cb)
      if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16)) None
      else Some(Profile("hvc1", profileIdc, levelIdc, bitDepth, chroma, w, h))
    } catch { case _: Exception => None }
  }

  /** HEVCDecoderConfigurationRecord (14496-15 §8.3.3.1): 22 fixed
    * bytes, then numOfArrays × { completeness+NAL-type u8, numNalus
    * u16, naluLength u16 + bytes ... }. The SPS array is NAL type 33.
    */
  def parseHvcC(b: Array[Byte], from: Int, until: Int): Option[Profile] = {
    if (b == null || until - from < 23) return None
    if ((b(from) & 0xff) != 1) return None
    val numArrays = b(from + 22) & 0xff
    var p = from + 23
    var a = 0
    while (a < numArrays && p + 3 <= until) {
      val nalType = b(p) & 0x3f
      val numNalus = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
      p += 3
      var n = 0
      while (n < numNalus && p + 2 <= until) {
        val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        p += 2
        if (p + len > until) return None
        if (nalType == 33)
          return parseHevcSps(java.util.Arrays.copyOfRange(b, p, p + len))
        p += len
        n += 1
      }
      a += 1
    }
    None
  }

  /** VP9 codec configuration (`vpcC`, VP9-in-ISO-BMFF binding §2.2):
    * a FullBox — 4 version/flags bytes, then profile u8, level u8,
    * bitDepth(4) | chromaSubsampling(3) | videoFullRangeFlag(1).
    * Fixed layout, no bitstream parse; VP9 configs carry no geometry
    * (codedWidth/Height 0 — the container's sample entry is
    * authoritative for VP9).
    */
  def parseVpcC(b: Array[Byte], from: Int, until: Int): Option[Profile] = {
    if (b == null || until - from < 7) return None
    if ((b(from) & 0xff) != 1) return None // version 1 per the binding
    val profile = b(from + 4) & 0xff
    val level = b(from + 5) & 0xff
    val packed = b(from + 6) & 0xff
    val bitDepth = (packed >> 4) & 0xf
    val sub = (packed >> 1) & 0x7
    if (bitDepth != 8 && bitDepth != 10 && bitDepth != 12) return None
    val chroma = sub match {
      case 0 | 1 => 1 // 4:2:0 (vertical / colocated)
      case 2 => 2 // 4:2:2
      case 3 => 3 // 4:4:4
      case _ => return None
    }
    Some(Profile("vp09", profile, level, bitDepth, chroma, 0, 0))
  }

  /** AV1 codec configuration (`av1C`, AV1-in-ISO-BMFF §2.3.3): fixed
    * bitfields in the first 4 bytes — marker(1)+version(7) = 0x81,
    * seq_profile(3) | seq_level_idx_0(5), then tier(1),
    * high_bitdepth(1), twelve_bit(1), monochrome(1),
    * chroma_subsampling_x/y(1+1), chroma_sample_position(2). Bit
    * depth decodes per AV1 §5.5.2 (8/10/12 from high_bitdepth +
    * twelve_bit); geometry lives in the sequence-header OBU and is
    * not duplicated here (0, as vpcC).
    */
  def parseAv1C(b: Array[Byte], from: Int, until: Int): Option[Profile] = {
    if (b == null || until - from < 4) return None
    if ((b(from) & 0xff) != 0x81) return None
    val profile = (b(from + 1) >> 5) & 0x7
    val level = b(from + 1) & 0x1f
    val f = b(from + 2) & 0xff
    val highBd = (f >> 6) & 1
    val twelve = (f >> 5) & 1
    val mono = (f >> 4) & 1
    val subX = (f >> 3) & 1
    val subY = (f >> 2) & 1
    val bitDepth =
      if (highBd == 1 && twelve == 1) 12 else if (highBd == 1) 10 else 8
    val chroma =
      if (mono == 1) 0
      else if (subX == 1 && subY == 1) 1 // 4:2:0
      else if (subX == 1) 2 // 4:2:2
      else 3 // 4:4:4
    Some(Profile("av01", profile, level, bitDepth, chroma, 0, 0))
  }

  /** Dispatch on the record bytes alone (Matroska CodecPrivate hands
    * the record over WITHOUT naming the box): an avcC and an hvcC are
    * distinguishable by parse success — both start 0x01, but the field
    * layout diverges immediately after and the SPS NAL checks disagree.
    */
  def parseRecord(codecHint: String, b: Array[Byte]): Option[Profile] = {
    if (b == null) return None
    val h = if (codecHint == null) "" else codecHint
    if (h.contains("HEVC") || h.startsWith("hvc") || h.startsWith("hev"))
      parseHvcC(b, 0, b.length)
    else if (h.startsWith("vp09") || h.contains("VP9"))
      parseVpcC(b, 0, b.length)
    else if (h.startsWith("av01") || h.contains("AV1"))
      parseAv1C(b, 0, b.length)
    else parseAvcC(b, 0, b.length)
  }

  /** struct(codec, profile_idc, level_idc, bit_depth, chroma_format,
    * coded_width, coded_height) from a BMFF blob — walks to the video
    * track's stsd sample entry (via [[VideoContainer.codecConfigBytes]])
    * and parses the avcC/hvcC child. Null = no parseable config
    * (MJPEG-class codecs carry none; that is data, not corruption —
    * callers distinguish via the container's codec fourcc).
    */
  def codecProfile(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      VideoContainer.codecConfigBytes(b).flatMap { case (hint, rec) =>
        parseRecord(hint, rec)
      }.map(p => (p.codec, p.profileIdc, p.levelIdc, p.bitDepth,
        p.chromaFormat, p.codedWidth, p.codedHeight))
    }
    f(blob).cast("struct<codec:string,profile_idc:int,level_idc:int," +
      "bit_depth:int,chroma_format:int,coded_width:int,coded_height:int>")
  }
}
