package graft.operators

import graft.SparkSpec

class CodecConfigSpec extends SparkSpec {

  private def avcRoundTrip(profile: Int, level: Int, w: Int, h: Int,
      bd: Int): CodecConfig.Profile = {
    val sps = CodecFixtures.avcSps(profile, level, w, h, bd)
    CodecConfig.parseAvcSps(sps).getOrElse(
      fail(s"SPS refused: p=$profile w=$w h=$h bd=$bd"))
  }

  test("AVC SPS round-trip over the profile/geometry/bit-depth grid") {
    for {
      profile <- Seq(66, 77, 100)
      (w, h) <- Seq((160, 96), (162, 90), (176, 102), (1920, 1080),
        (1280, 720), (640, 360), (174, 100))
      bd <- if (profile == 100) Seq(8, 10, 12) else Seq(8)
    } {
      val p = avcRoundTrip(profile, 41, w, h, bd)
      assert(p.codec == "avc1")
      assert(p.profileIdc == profile && p.levelIdc == 41)
      assert(p.bitDepth == bd && p.chromaFormat == 1)
      assert(p.codedWidth == w, s"width: ${p.codedWidth} != $w")
      assert(p.codedHeight == h, s"height: ${p.codedHeight} != $h")
    }
  }

  test("1080p needs the crop path: 1088 coded rows minus 8") {
    // The classic case the naive (no conformance-window) parse gets
    // wrong: 1080 = 68 MB rows * 16 - 2*4 crop units.
    val p = avcRoundTrip(100, 42, 1920, 1080, 8)
    assert(p.codedHeight == 1080)
  }

  test("emulation-prevention bytes survive the round-trip") {
    // level_idc = 0 makes the constraint+level pair 00 00, and
    // sps_id = 255 encodes as ue with 8 leading zero BITS — a zero
    // byte right after, so the encoder MUST insert 00 00 03 and the
    // parser must strip it: a byte-shift here corrupts every later
    // field.
    val sps = CodecFixtures.avcSps(66, 0, 160, 96, 8, spsId = 255)
    val hasEp = sps.sliding(3).exists(s =>
      s(0) == 0 && s(1) == 0 && s(2) == 3)
    assert(hasEp, "fixture produced no 00 00 03 — test is vacuous")
    val p = CodecConfig.parseAvcSps(sps).get
    assert(p.levelIdc == 0 && p.codedWidth == 160 && p.codedHeight == 96)
  }

  test("HEVC SPS round-trip incl. conformance window") {
    for {
      profile <- Seq(1, 2)
      (w, h) <- Seq((160, 96), (162, 90), (1920, 1080), (174, 100))
      bd <- Seq(8, 10)
    } {
      val sps = CodecFixtures.hevcSps(profile, 93, w, h, bd)
      val p = CodecConfig.parseHevcSps(sps).get
      assert(p.codec == "hvc1" && p.profileIdc == profile)
      assert(p.levelIdc == 93 && p.bitDepth == bd)
      assert(p.codedWidth == w && p.codedHeight == h)
    }
  }

  test("avcC / hvcC records parse through the container route") {
    val b = CodecFixtures.mp4WithConfig(162, 90, 5, 6, 2,
      hevc = false, profileIdc = 100, levelIdc = 41, bitDepth = 10)
    val (hint, rec) = VideoContainer.codecConfigBytes(b).get
    assert(hint == "avc1")
    val p = CodecConfig.parseRecord(hint, rec).get
    assert(p.profileIdc == 100 && p.bitDepth == 10 &&
      p.codedWidth == 162 && p.codedHeight == 90)

    val hb = CodecFixtures.mp4WithConfig(176, 102, 5, 6, 2,
      hevc = true, profileIdc = 2, levelIdc = 120, bitDepth = 10)
    val (hHint, hRec) = VideoContainer.codecConfigBytes(hb).get
    assert(hHint == "hvc1")
    val hp = CodecConfig.parseRecord(hHint, hRec).get
    assert(hp.profileIdc == 2 && hp.codedWidth == 176 &&
      hp.codedHeight == 102)
  }

  test("the container parse itself still reads the coded MP4") {
    val b = CodecFixtures.mp4WithConfig(160, 96, 5, 8, 2,
      hevc = false, profileIdc = 77, levelIdc = 31, bitDepth = 8)
    val m = VideoContainer.parse(b).get
    assert(m.codec == "avc1" && m.width == 160 && m.height == 96 &&
      m.nFrames == 8)
  }

  test("Matroska CodecPrivate hands over the identical record") {
    val rec = CodecFixtures.avcC(CodecFixtures.avcSps(100, 41, 162, 90, 10))
    val mkv = VideoFixtures.mkvWithCodecPrivate(162, 90, 5, 6, 2,
      "V_MPEG4/ISO/AVC", rec)
    val (hint, got) = MkvContainer.codecPrivate(mkv).get
    assert(hint == "V_MPEG4/ISO/AVC")
    assert(java.util.Arrays.equals(got, rec))
    val p = CodecConfig.parseRecord(hint, got).get
    assert(p.codedWidth == 162 && p.bitDepth == 10)
    // And the block scan still works on the private-carrying track.
    val m = MkvContainer.parse(mkv).get
    assert(m.nFrames == 6 && m.nKeyframes == 3)
  }

  test("vpcC / av1C fixed-field records parse for all family values") {
    for (bd <- Seq(8, 10, 12); sub <- 0 to 3) {
      val p = CodecConfig.parseVpcC(
        CodecFixtures.vpcC(2, 41, bd, sub), 0, 12).get
      assert(p.codec == "vp09" && p.profileIdc == 2 && p.levelIdc == 41)
      assert(p.bitDepth == bd)
      assert(p.chromaFormat == (sub match {
        case 0 | 1 => 1; case 2 => 2; case _ => 3 }))
    }
    for (bd <- Seq(8, 10, 12); prof <- 0 to 2) {
      val rec = CodecFixtures.av1C(prof, 13, bd)
      val p = CodecConfig.parseAv1C(rec, 0, rec.length).get
      assert(p.codec == "av01" && p.profileIdc == prof &&
        p.levelIdc == 13 && p.bitDepth == bd && p.chromaFormat == 1)
    }
    // Monochrome and 4:4:4 chroma decode.
    assert(CodecConfig.parseAv1C(
      CodecFixtures.av1C(0, 1, 8, mono = 1), 0, 4).get.chromaFormat == 0)
    assert(CodecConfig.parseAv1C(
      CodecFixtures.av1C(1, 1, 8, subX = 0, subY = 0), 0, 4)
      .get.chromaFormat == 3)
    // Container route: the vpcC/av1C child boxes dispatch by sample
    // entry fourcc through parseRecord.
    val vb = VideoFixtures.codedMp4(160, 96, 5, 4, 2, "vp09",
      VideoFixtures.box("vpcC")(w => w.bytes(CodecFixtures.vpcC(0, 31, 10, 0))))
    val (vHint, vRec) = VideoContainer.codecConfigBytes(vb).get
    assert(vHint == "vp09")
    assert(CodecConfig.parseRecord(vHint, vRec).get.bitDepth == 10)
    val ab = VideoFixtures.codedMp4(160, 96, 5, 4, 2, "av01",
      VideoFixtures.box("av1C")(w => w.bytes(CodecFixtures.av1C(0, 5, 8))))
    val (aHint, aRec) = VideoContainer.codecConfigBytes(ab).get
    assert(aHint == "av01")
    assert(CodecConfig.parseRecord(aHint, aRec).get.levelIdc == 5)
    // Corrupt refusals: wrong marker/version, bad bit depth.
    assert(CodecConfig.parseAv1C(Array[Byte](0x01, 0, 0, 0), 0, 4).isEmpty)
    assert(CodecConfig.parseVpcC(
      Array[Byte](2, 0, 0, 0, 0, 0, 0), 0, 7).isEmpty)
    val badBd = CodecFixtures.vpcC(0, 10, 9, 0)
    assert(CodecConfig.parseVpcC(badBd, 0, badBd.length).isEmpty)
  }

  test("out-of-domain SPS fields quarantine instead of minting " +
    "garbage facts (review fix)") {
    // A high-profile SPS whose chroma_format_idc decodes to 4: bytes
    // after the (profile, constraint, level) prefix start with the
    // exp-Golomb pair sps_id=0 ("1") then ue(4) = "00101". Hand-pack:
    // 0x67, 100, 0, 31, then bits 1 00101 ... => 0b10010100 = 0x94.
    val corrupt = Array[Byte](0x67, 100.toByte, 0, 31, 0x94.toByte,
      0x55, 0x55, 0x55, 0x55)
    assert(CodecConfig.parseAvcSps(corrupt).isEmpty,
      "chroma_format_idc=4 must quarantine")
    // Systematic: flip every byte of a valid SPS one at a time; the
    // parse must never throw, and must never report an out-of-domain
    // chroma/bit-depth.
    val good = CodecFixtures.avcSps(100, 41, 162, 90, 10)
    (0 until good.length).foreach { k =>
      (1 to 255 by 64).foreach { v =>
        val m = good.clone(); m(k) = (m(k) ^ v).toByte
        CodecConfig.parseAvcSps(m).foreach { p =>
          assert(p.chromaFormat <= 3 && p.bitDepth <= 14,
            s"garbage facts at byte $k xor $v: $p")
        }
      }
    }
    val goodH = CodecFixtures.hevcSps(1, 93, 160, 96, 8)
    (0 until goodH.length).foreach { k =>
      val m = goodH.clone(); m(k) = (m(k) ^ 0x5a).toByte
      CodecConfig.parseHevcSps(m).foreach { p =>
        assert(p.chromaFormat <= 3 && p.bitDepth <= 16)
      }
    }
  }

  test("corrupt and alien input quarantines as None, never throws") {
    assert(CodecConfig.parseAvcSps(null).isEmpty)
    assert(CodecConfig.parseAvcSps(Array[Byte](0x67, 0x64)).isEmpty)
    assert(CodecConfig.parseHevcSps("garbage bytes".getBytes).isEmpty)
    // Wrong NAL type refuses cleanly.
    val sps = CodecFixtures.avcSps(66, 30, 160, 96, 8)
    val wrongType = sps.clone(); wrongType(0) = 0x61.toByte
    assert(CodecConfig.parseAvcSps(wrongType).isEmpty)
    // Truncated records at every prefix length parse to None or Some
    // — never an exception reaching the caller.
    val rec = CodecFixtures.avcC(sps)
    (0 until rec.length).foreach { n =>
      CodecConfig.parseAvcC(rec, 0, n)
    }
    val hrec = CodecFixtures.hvcC(
      CodecFixtures.hevcSps(1, 93, 160, 96, 8), 1, 93)
    (0 until hrec.length).foreach { n =>
      CodecConfig.parseHvcC(hrec, 0, n)
    }
    // A config-less sample entry (MJPEG-class): None is data, not an
    // error.
    val plain = VideoFixtures.mp4(64, 64, 5, 4, 2)
    assert(VideoContainer.codecConfigBytes(plain).isEmpty)
    val mjpeg = VideoFixtures.mjpegMp4(64, 64, 5, 2, 1, _ => 0x808080)
    assert(VideoContainer.codecConfigBytes(mjpeg).isEmpty)
    // Plain mkv (no CodecPrivate element) likewise.
    val plainMkv = VideoFixtures.mkv(64, 64, 5, 4, 2)
    assert(MkvContainer.codecPrivate(plainMkv).isEmpty)
  }
}
