package graft.operators

/** Spec-conformant AVC/HEVC decoder-configuration synthesis — the
  * [[CodecConfig]] gate's fixture side, mirroring [[VideoFixtures]]'s
  * build∘parse-identity discipline: every record is a pure function of
  * a handful of integer parameters, so the DuckDB oracle can replay
  * the arithmetic while the PARSER must invert real exp-Golomb
  * bitstreams (ITU-T H.264 §7.3.2.1.1 / H.265 §7.3.2.2 syntax,
  * ISO/IEC 14496-15 record layouts) — including emulation-prevention
  * handling and the conformance-crop math for non-multiple-of-16
  * picture sizes.
  */
object CodecFixtures {

  /** MSB-first bit writer with exp-Golomb, RBSP trailing bits, and
    * emulation-prevention insertion on byte-out (H.264 §7.4.1: any
    * 00 00 0x with x<=3 inside the payload gets an 03 inserted —
    * the inverse of [[CodecConfig]]'s rbsp strip).
    */
  private final class BitW {
    private val bits = new scala.collection.mutable.ArrayBuffer[Boolean]
    def u(v: Long, n: Int): BitW = {
      var k = n - 1
      while (k >= 0) { bits += (((v >> k) & 1L) == 1L); k -= 1 }
      this
    }
    def ue(v: Int): BitW = {
      require(v >= 0)
      val code = v + 1
      val lz = 31 - Integer.numberOfLeadingZeros(code)
      u(0, lz) // lz leading zeros
      u(code.toLong, lz + 1)
    }
    def se(v: Int): BitW = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit + zero-pad to byte. */
    def trailing(): BitW = { u(1, 1); while (bits.length % 8 != 0) u(0, 1); this }
    /** Bytes with emulation prevention applied AFTER `rawPrefix`
      * bytes (NAL headers are never escaped).
      */
    def result(rawPrefix: Int): Array[Byte] = {
      val raw = new Array[Byte](bits.length / 8)
      var i = 0
      while (i < raw.length) {
        var v = 0
        var j = 0
        while (j < 8) { v = (v << 1) | (if (bits(i * 8 + j)) 1 else 0); j += 1 }
        raw(i) = v.toByte
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream(raw.length + 4)
      var zeros = 0
      i = 0
      while (i < raw.length) {
        val v = raw(i) & 0xff
        if (i >= rawPrefix && zeros >= 2 && v <= 3) {
          out.write(3); zeros = 0
        }
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
        i += 1
      }
      out.toByteArray
    }
  }

  /** An H.264 SPS NAL for a `width`×`height` 4:2:0 stream (both even;
    * coded size rounds up to 16, the difference expressed as
    * frame-crop right/bottom). High-family profiles (100...) carry the
    * chroma/bit-depth block with `bitDepth`; Baseline/Main (66/77)
    * imply 8-bit 4:2:0 per the spec.
    */
  def avcSps(profileIdc: Int, levelIdc: Int, width: Int, height: Int,
      bitDepth: Int, spsId: Int = 0): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val w = new BitW
    w.u(0x67, 8) // nal: forbidden 0, ref_idc 3, type 7 (SPS)
    w.u(profileIdc.toLong, 8)
    w.u(0, 8) // constraint flags + reserved
    w.u(levelIdc.toLong, 8)
    w.ue(spsId) // seq_parameter_set_id (non-0 only by EP-path tests)
    val high = Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
      134, 135).contains(profileIdc)
    if (high) {
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(bitDepth - 8)
      w.ue(bitDepth - 8)
      w.u(0, 1) // qpprime
      w.u(0, 1) // seq_scaling_matrix_present
    } else require(bitDepth == 8, "non-high profiles are 8-bit")
    w.ue(4) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type 0
    w.ue(4) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(3) // max_num_ref_frames
    w.u(0, 1) // gaps_in_frame_num
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    w.ue(wMbs - 1)
    w.ue(hMbs - 1)
    w.u(1, 1) // frame_mbs_only_flag
    w.u(1, 1) // direct_8x8_inference
    val cropR = (wMbs * 16 - width) / 2 // crop unit X = SubWidthC = 2
    val cropB = (hMbs * 16 - height) / 2 // crop unit Y = 2 (frame, 4:2:0)
    if (cropR > 0 || cropB > 0) {
      w.u(1, 1).ue(0).ue(cropR).ue(0).ue(cropB)
    } else w.u(0, 1)
    w.u(0, 1) // vui_parameters_present
    w.trailing()
    w.result(rawPrefix = 1)
  }

  /** AVCDecoderConfigurationRecord wrapping one SPS (no PPS — the
    * stream-properties contract needs none; 14496-15 permits zero).
    */
  def avcC(sps: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sps.length + 8)
    out.write(1) // configurationVersion
    out.write(sps(1) & 0xff) // AVCProfileIndication (mirrors SPS)
    out.write(sps(2) & 0xff)
    out.write(sps(3) & 0xff)
    out.write(0xff) // reserved(6) + lengthSizeMinusOne 3
    out.write(0xe1) // reserved(3) + numOfSequenceParameterSets 1
    out.write((sps.length >> 8) & 0xff)
    out.write(sps.length & 0xff)
    out.write(sps, 0, sps.length)
    out.write(0) // numOfPictureParameterSets
    out.toByteArray
  }

  /** An H.265 SPS NAL (no sub-layers): 4:2:0, `width`×`height` both
    * even; pic_*_in_luma_samples rounds up to the 8-sample min CB and
    * the difference goes in the conformance window (chroma units).
    */
  def hevcSps(profileIdc: Int, levelIdc: Int, width: Int, height: Int,
      bitDepth: Int): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val w = new BitW
    w.u(0x42, 8).u(0x01, 8) // nal type 33, layer 0, tid+1 = 1
    w.u(0, 4) // sps_video_parameter_set_id
    w.u(0, 3) // sps_max_sub_layers_minus1
    w.u(1, 1) // sps_temporal_id_nesting_flag
    // profile_tier_level, no sub-layers:
    w.u(0, 2) // general_profile_space
    w.u(0, 1) // general_tier_flag
    w.u(profileIdc.toLong, 5)
    w.u(1L << (31 - profileIdc), 32) // compatibility: own bit set
    w.u(0L, 32).u(0L, 16) // 48 constraint/reserved bits
    w.u(levelIdc.toLong, 8)
    w.ue(0) // sps_seq_parameter_set_id
    w.ue(1) // chroma_format_idc 4:2:0
    val picW = (width + 7) / 8 * 8
    val picH = (height + 7) / 8 * 8
    w.ue(picW)
    w.ue(picH)
    val winR = (picW - width) / 2
    val winB = (picH - height) / 2
    if (winR > 0 || winB > 0) w.u(1, 1).ue(0).ue(winR).ue(0).ue(winB)
    else w.u(0, 1)
    w.ue(bitDepth - 8)
    w.ue(bitDepth - 8)
    // The parser stops at bit depths; close the RBSP legally anyway.
    w.trailing()
    w.result(rawPrefix = 2)
  }

  /** HEVCDecoderConfigurationRecord with one SPS array entry. */
  def hvcC(sps: Array[Byte], profileIdc: Int, levelIdc: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sps.length + 28)
    out.write(1) // configurationVersion
    out.write(profileIdc & 0x1f) // space 0, tier 0, profile
    out.write(Array[Byte](0, 0, 0, 0), 0, 4) // compatibility flags
    out.write(Array[Byte](0, 0, 0, 0, 0, 0), 0, 6) // constraint flags
    out.write(levelIdc & 0xff)
    out.write(0xf0); out.write(0) // min_spatial_segmentation_idc
    out.write(0xfc) // parallelismType
    out.write(0xfc | 1) // chromaFormat 4:2:0
    out.write(0xf8) // bitDepthLumaMinus8 (informational; SPS rules)
    out.write(0xf8)
    out.write(0); out.write(0) // avgFrameRate
    out.write(0x0f) // cfr 0, numTemporalLayers 1, nested 1, lenSize 3
    out.write(1) // numOfArrays
    out.write(0x80 | 33) // array_completeness + NAL type SPS
    out.write(0); out.write(1) // numNalus
    out.write((sps.length >> 8) & 0xff)
    out.write(sps.length & 0xff)
    out.write(sps, 0, sps.length)
    out.toByteArray
  }

  /** A `vpcC` record (VP9 binding §2.2): version-1 FullBox payload,
    * fixed fields only. `sub`: 0/1 = 4:2:0, 2 = 4:2:2, 3 = 4:4:4.
    */
  def vpcC(profile: Int, level: Int, bitDepth: Int, sub: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(12)
    out.write(1); out.write(0); out.write(0); out.write(0) // verflags
    out.write(profile & 0xff)
    out.write(level & 0xff)
    out.write(((bitDepth & 0xf) << 4) | ((sub & 0x7) << 1))
    out.write(1); out.write(1); out.write(1) // colour/transfer/matrix
    out.write(0); out.write(0) // codecInitDataSize
    out.toByteArray
  }

  /** An `av1C` record (AV1 binding §2.3.3): the 4 fixed bytes, no
    * config OBUs. bitDepth ∈ {8, 10, 12} packs to
    * high_bitdepth/twelve_bit per AV1 §5.5.2.
    */
  def av1C(profile: Int, level: Int, bitDepth: Int,
      subX: Int = 1, subY: Int = 1, mono: Int = 0): Array[Byte] = {
    val highBd = if (bitDepth >= 10) 1 else 0
    val twelve = if (bitDepth == 12) 1 else 0
    val out = new java.io.ByteArrayOutputStream(4)
    out.write(0x81)
    out.write(((profile & 0x7) << 5) | (level & 0x1f))
    out.write((highBd << 6) | (twelve << 5) | ((mono & 1) << 4) |
      ((subX & 1) << 3) | ((subY & 1) << 2))
    out.write(0)
    out.toByteArray
  }

  /** The one-call fixture: an MP4 whose sample entry carries a real
    * avcC (`hevc = false`) or hvcC record coding `width`×`height` at
    * `bitDepth` — [[VideoFixtures.codedMp4]] supplies the container.
    */
  def mp4WithConfig(width: Int, height: Int, fps: Int, nFrames: Int,
      keyEvery: Int, hevc: Boolean, profileIdc: Int, levelIdc: Int,
      bitDepth: Int): Array[Byte] = {
    // Container geometry carries the DISPLAY (cropped) size, as real
    // muxers write; the coded size lives only in the SPS. The record
    // is wrapped in its stsd CHILD BOX here; Matroska CodecPrivate
    // carries the record bytes bare.
    if (hevc)
      VideoFixtures.codedMp4(width, height, fps, nFrames, keyEvery, "hvc1",
        VideoFixtures.box("hvcC")(w => w.bytes(
          hvcC(hevcSps(profileIdc, levelIdc, width, height, bitDepth),
            profileIdc, levelIdc))))
    else
      VideoFixtures.codedMp4(width, height, fps, nFrames, keyEvery, "avc1",
        VideoFixtures.box("avcC")(w => w.bytes(
          avcC(avcSps(profileIdc, levelIdc, width, height, bitDepth)))))
  }
}
