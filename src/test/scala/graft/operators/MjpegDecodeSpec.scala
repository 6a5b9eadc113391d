package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The real video pixel path: MJPEG samples sliced by the container
  * layer and rasterized by ImageIO (Multimodal.decodeKeyframes).
  */
class MjpegDecodeSpec extends SparkSpec {

  private def rgbOf(docId: Long)(i: Int): Int = {
    val r = 32 * ((docId + i) % 8).toInt + 16
    val g = 32 * ((docId * 3 + i) % 8).toInt + 16
    val b = 32 * ((docId * 7 + i) % 8).toInt + 16
    (r << 16) | (g << 8) | b
  }

  test("mjpegMp4 is a parseable MP4 with codec jpeg and real JPEG samples") {
    val blob = VideoFixtures.mjpegMp4(64, 48, 5, nFrames = 7, keyEvery = 3,
      rgbOf = rgbOf(11L))
    val m = VideoContainer.parse(blob).get
    assert(m.format == "mp4" && m.codec == "jpeg")
    assert(m.width == 64 && m.height == 48 && m.nFrames == 7L)
    assert(m.nKeyframes == 3L) // samples 1, 4, 7
    val kfs = VideoContainer.keyframeRanges(blob)
    assert(kfs.map(_.sample).toSeq == Seq(1, 4, 7))
    kfs.foreach { k =>
      val payload =
        java.util.Arrays.copyOfRange(blob, k.offset.toInt,
          (k.offset + k.size).toInt)
      // SOI magic: every sliced keyframe is a standalone JPEG.
      assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(img != null && img.getWidth == 64 && img.getHeight == 48)
      // Uniform fill decodes inside the 32-wide bucket the builder chose.
      val want = rgbOf(11L)(k.sample)
      val got = img.getRGB(5, 5)
      def bucket(v: Int) = v / 32
      assert(bucket((got >> 16) & 0xff) == bucket((want >> 16) & 0xff))
      assert(bucket((got >> 8) & 0xff) == bucket((want >> 8) & 0xff))
      assert(bucket(got & 0xff) == bucket(want & 0xff))
    }
  }

  test("decodeKeyframes rasterizes only keyframes with exact geometry and buckets") {
    val s = spark
    import s.implicits._
    val docs = Seq(3L, 4L, 5L).toDF("doc_id")
    val build = udf { docId: Long =>
      VideoFixtures.mjpegMp4(48, 32, 5, nFrames = 6, keyEvery = 2,
        rgbOf = rgbOf(docId))
    }
    val out = Multimodal.decodeKeyframes(
        docs.withColumn("media", build($"doc_id")))
      .collect()
    assert(out.length == 9) // 3 docs x keyframes {1,3,5}
    out.foreach { r =>
      val docId = r.getLong(0)
      val sample = r.getInt(1)
      assert(Seq(1, 3, 5).contains(sample))
      assert(r.getInt(2) == 48 && r.getInt(3) == 32)
      val want = rgbOf(docId)(sample)
      assert(r.getInt(4) / 32 == ((want >> 16) & 0xff) / 32, s"r doc=$docId s=$sample")
      assert(r.getInt(5) / 32 == ((want >> 8) & 0xff) / 32, s"g doc=$docId s=$sample")
      assert(r.getInt(6) / 32 == (want & 0xff) / 32, s"b doc=$docId s=$sample")
    }
  }

  test("MJPEG AVI: movi facts override the header hint; idx1 ranges decode") {
    val blob = VideoFixtures.aviMjpeg(64, 48, usPerFrame = 40000L,
      nFrames = 7, keyEvery = 3, rgbOf = rgbOf(5L))
    val m = VideoContainer.parse(blob).get
    assert(m.format == "avi" && m.codec == "MJPG")
    assert(m.width == 64 && m.height == 48)
    assert(m.nFrames == 7L && m.nKeyframes == 3L) // idx1 flags 1,4,7
    assert(m.durationMs == 7L * 40L) // movi count x 40ms
    val kfs = VideoContainer.keyframeRanges(blob)
    assert(kfs.map(_.sample).toSeq == Seq(1, 4, 7))
    kfs.foreach { k =>
      val p = java.util.Arrays.copyOfRange(blob, k.offset.toInt,
        (k.offset + k.size).toInt)
      assert((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) // a JPEG
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img != null && img.getWidth == 64)
      val want = rgbOf(5L)(k.sample)
      assert((img.getRGB(3, 3) >> 16 & 0xff) / 32 == ((want >> 16) & 0xff) / 32)
    }
  }

  test("sparse idx1 (keyframes only) still counts frames from the movi walk") {
    val b = VideoFixtures.aviMjpeg(48, 32, 40000L, nFrames = 7,
      keyEvery = 3, rgbOf = rgbOf(4L), indexAll = false)
    val m = VideoContainer.parse(b).get
    assert(m.nFrames == 7L, s"frame count must come from movi, got $m")
    assert(m.nKeyframes == 3L)
    val kfs = VideoContainer.keyframeRanges(b)
    // Sample numbers recover their movi ordinal despite the sparse index.
    assert(kfs.map(_.sample).toSeq == Seq(1, 4, 7))
    kfs.foreach { k =>
      assert((b(k.offset.toInt) & 0xff) == 0xff &&
        (b(k.offset.toInt + 1) & 0xff) == 0xd8)
    }
  }

  test("index-less AVI falls back to intra-only: every movi chunk is sync") {
    val full = VideoFixtures.aviMjpeg(48, 32, 50000L, nFrames = 5,
      keyEvery = 2, rgbOf = rgbOf(2L))
    // Truncate idx1 off the tail: find it and cut there (top-level
    // sibling after LIST movi).
    val s = new String(full, "ISO-8859-1")
    val cut = s.indexOf("idx1")
    assert(cut > 0)
    val noIdx = java.util.Arrays.copyOf(full, cut)
    val m = VideoContainer.parse(noIdx).get
    assert(m.nFrames == 5L)
    assert(m.nKeyframes == 5L) // intra-only assumption
    val kfs = VideoContainer.keyframeRanges(noIdx)
    assert(kfs.map(_.sample).toSeq == Seq(1, 2, 3, 4, 5))
    kfs.foreach { k =>
      assert((noIdx(k.offset.toInt) & 0xff) == 0xff &&
        (noIdx(k.offset.toInt + 1) & 0xff) == 0xd8)
    }
  }

  test("MJPEG Matroska: V_MJPEG SimpleBlock payloads slice and decode") {
    val blob = VideoFixtures.mkvMjpeg(64, 48, 5, nFrames = 7, keyEvery = 3,
      rgbOf = rgbOf(6L))
    val m = MkvContainer.parse(blob).get
    assert(m.codec == "V_MJPEG" && m.nFrames == 7L && m.nKeyframes == 3L)
    val (codec, kfs) = MkvContainer.codecRanges(blob).get
    assert(codec == "V_MJPEG")
    assert(kfs.map(_.sample).toSeq == Seq(1, 4, 7))
    kfs.foreach { k =>
      val p = java.util.Arrays.copyOfRange(blob, k.offset.toInt,
        (k.offset + k.size).toInt)
      assert((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) // a JPEG
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img != null && img.getWidth == 64 && img.getHeight == 48)
      val want = rgbOf(6L)(k.sample)
      assert((img.getRGB(2, 2) >> 8 & 0xff) / 32 == ((want >> 8) & 0xff) / 32)
    }
    // The DataFrame path routes the EBML container like the other two.
    val s = spark
    import s.implicits._
    val out = Multimodal.decodeKeyframes(Seq((6L, blob)).toDF("doc_id", "media"))
      .orderBy($"sample").collect()
    assert(out.length == 3 && out.forall(_.getInt(2) == 64))
  }

  test("fixed-size-laced keyframe block splits into equal per-frame ranges") {
    val blob = VideoFixtures.mkvLaced(64, 48, 5, nFrames = 6)
    val (_, kfs) = MkvContainer.codecRanges(blob).get
    assert(kfs.length == 6)
    assert(kfs.map(_.sample).toSeq == (1 to 6))
    assert(kfs.forall(_.size == 4L)) // six BE32 payloads, equal split
    kfs.zipWithIndex.foreach { case (k, i) =>
      val off = k.offset.toInt
      val magic = ((blob(off) & 0xff) << 24) | ((blob(off + 1) & 0xff) << 16) |
        ((blob(off + 2) & 0xff) << 8) | (blob(off + 3) & 0xff)
      assert(magic == i + 1, s"lace frame ${i + 1} sliced at wrong offset")
    }
  }

  test("non-MJPEG codecs are excluded; corrupt frames quarantine with null fields") {
    val s = spark
    import s.implicits._
    // avc1 synthetic blob: codec outside the JPEG family -> no rows.
    val avc = Seq(1L).toDF("doc_id")
      .withColumn("media", udf(() => VideoFixtures.mp4(64, 48, 5, 6, 2)).apply())
    assert(Multimodal.decodeKeyframes(avc).count() == 0L)

    // Corrupt ONE keyframe payload in place: its row survives with
    // null frame fields (visible quarantine), others decode.
    val blob = VideoFixtures.mjpegMp4(48, 32, 5, nFrames = 6, keyEvery = 2,
      rgbOf = rgbOf(9L))
    val k = VideoContainer.keyframeRanges(blob)(1) // sample 3
    val corrupt = blob.clone()
    java.util.Arrays.fill(corrupt, k.offset.toInt,
      (k.offset + math.min(k.size, 16L)).toInt, 0x00.toByte)
    val out = Multimodal.decodeKeyframes(
        Seq((9L, corrupt)).toDF("doc_id", "media"))
      .orderBy($"sample").collect()
    assert(out.length == 3)
    assert(out(0).getInt(2) == 48) // sample 1 decodes
    assert(out(1).isNullAt(2) && out(1).isNullAt(4)) // sample 3 quarantined
    assert(out(2).getInt(2) == 48) // sample 5 decodes
  }
}
