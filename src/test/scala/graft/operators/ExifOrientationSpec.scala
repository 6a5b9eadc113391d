package graft.operators

import graft.SparkSpec

class ExifOrientationSpec extends SparkSpec {

  test("EXIF APP1 orientation parses from a real JPEG for all 8 values") {
    (1 to 8).foreach { o =>
      val b = ImageHeader.exifJpegFixture(48, 32, o, 0x336699)
      assert(ImageHeader.exifOrientation(b).contains(o), s"o=$o")
      // The geometry parse must still read the SOF through the
      // spliced APP1.
      val m = ImageHeader.parse(b).get
      assert(m.format == "jpeg" && m.width == 48 && m.height == 32)
    }
  }

  test("bare TIFF orientation tag parses; fixture geometry intact") {
    val b = ImageHeader.tiffFixture(100, 60, 6)
    assert(ImageHeader.exifOrientation(b).contains(6))
    val m = ImageHeader.parse(b).get
    assert(m.format == "tiff" && m.width == 100 && m.height == 60 &&
      m.channels == 3)
  }

  test("orientation-less formats and plain JPEGs return None (default 1)") {
    assert(ImageHeader.exifOrientation(null).isEmpty)
    assert(ImageHeader.exifOrientation(
      ImageHeader.bmpFixture(10, 10)).isEmpty)
    // A JFIF JPEG with no APP1: walk reaches SOS and stops.
    assert(ImageHeader.exifOrientation(
      VideoFixtures.solidJpeg(16, 16, 0xff0000)).isEmpty)
    // Out-of-range orientation value refuses rather than inventing.
    val t = ImageHeader.tiffFixture(10, 10, 1)
    // tag value lives at IFD entry 3 (tag 274) value offset: patch to 9
    val bad = t.clone()
    // II header 8 + count 2 + 2 entries*12 + tag(2)+type(2)+cnt(4) = 42
    bad(42) = 9
    assert(ImageHeader.exifOrientation(bad).isEmpty)
  }

  test("truncated EXIF segments quarantine, never throw") {
    val b = ImageHeader.exifJpegFixture(24, 16, 7, 0)
    (0 until b.length).foreach { n =>
      ImageHeader.exifOrientation(java.util.Arrays.copyOf(b, n))
    }
    val t = ImageHeader.tiffFixture(20, 20, 3)
    (0 until t.length).foreach { n =>
      ImageHeader.exifOrientation(java.util.Arrays.copyOf(t, n))
    }
  }

  test("orientedMeta swaps display dims exactly for the 5-8 quadrant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 8).map(o =>
      (o, ImageHeader.exifJpegFixture(48, 32, o, 0x112233)))
    val out = rows.toDF("o", "blob")
      .withColumn("m", ImageHeader.orientedMeta(col("blob")))
      .select($"o", $"m.orientation", $"m.display_width",
        $"m.display_height")
      .as[(Int, Int, Int, Int)].collect().sortBy(_._1)
    out.foreach { case (o, po, dw, dh) =>
      assert(po == o)
      if (o >= 5) assert(dw == 32 && dh == 48)
      else assert(dw == 48 && dh == 32)
    }
  }
}
