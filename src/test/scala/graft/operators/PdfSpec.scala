package graft.operators

import graft.SparkSpec

class PdfSpec extends SparkSpec {

  test("fixture round trip: pages, objects, text (escapes, TJ word " +
    "gaps, hex strings, Flate and raw streams), complete") {
    for (docId <- Seq(0L, 1L, 2L, 5L, 123L, 4567L)) {
      val e = Pdf.extract(PdfFixtures.pdf(docId)).get
      val nPages = 1 + (docId % 3).toInt
      assert(e.nPages == nPages, s"doc $docId pages ${e.nPages}")
      assert(e.nObjects == 3 + 2 * nPages)
      val want = (0 until nPages)
        .map(p => PdfFixtures.pageText(docId, p)).mkString("\n")
      assert(e.text == want,
        s"doc $docId text:\n${e.text}\n-- want --\n$want")
      assert(e.complete, s"doc $docId must extract completely")
    }
  }

  test("honest incompleteness: unsupported filters and CID fonts flip " +
    "the flag; junk header offsets tolerated to 1024") {
    val base = PdfFixtures.pdf(1L)
    // Junk before the header (a crawl artifact) still parses.
    val junk = ("GARBAGE" * 10).getBytes ++ base
    assert(Pdf.extract(junk).exists(_.complete))
    assert(Pdf.extract(new Array[Byte](2000) ++ base).isEmpty,
      "header past 1024 bytes is not a PDF")
    // An extra object with an unsupported filter: text of good pages
    // survives, complete = false.
    val dct = ("99 0 obj\n<< /Length 3 /Filter /DCTDecode >>\n" +
      "stream\nabc\nendstream\nendobj\n").getBytes("ISO-8859-1")
    val mixed = Pdf.extract(base ++ dct).get
    assert(!mixed.complete && mixed.text.contains("doc-1-p0"))
    // A Type0 (CID) font anywhere flags incomplete decode.
    val cid = ("98 0 obj\n<< /Type /Font /Subtype /Type0 >>\nendobj\n")
      .getBytes("ISO-8859-1")
    assert(!Pdf.extract(base ++ cid).get.complete)
  }

  test("real-world stream content: dict markers, XMP packets, and " +
    "truncated deflate degrade honestly — never quarantine the doc") {
    val base = PdfFixtures.pdf(2L)
    // An unfiltered metadata stream full of '<' tokens (XMP) and a
    // tagged-PDF marked-content dict inside a text block: both are
    // routine in production PDFs and neither is a hex string.
    val xmp = ("97 0 obj\n<< /Length 59 >>\nstream\n" +
      "<?xpacket begin?><x:xmpmeta>data</x:xmpmeta><?xpacket end?>\n" +
      "endstream\nendobj\n").getBytes("ISO-8859-1")
    val mc = ("96 0 obj\n<< /Length 40 >>\nstream\n" +
      "BT /P <</MCID 0>> BDC (ok) Tj EMC ET\n" +
      "endstream\nendobj\n").getBytes("ISO-8859-1")
    val e = Pdf.extract(base ++ xmp ++ mc).get
    assert(e.text.contains("doc-2-p0"), "fixture pages must survive")
    assert(e.text.contains("ok"), "text after a marked-content dict " +
      s"must extract, got:\n${e.text}")
    assert(!e.text.contains("xpacket"), "XMP is metadata, not shows")
    // Truncated deflate payload (endstream still present): the partial
    // inflate must flip complete, not pass off a cut stream as whole.
    val d = new java.util.zip.Deflater()
    d.setInput("BT (gone) Tj ET".getBytes); d.finish()
    val db = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) db.write(buf, 0, d.deflate(buf))
    d.end()
    val cut = java.util.Arrays.copyOf(db.toByteArray, db.size() - 3)
    val trunc = ("95 0 obj\n<< /Length " + cut.length +
      " /Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1") ++
      cut ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val t = Pdf.extract(base ++ trunc).get
    assert(!t.complete, "a truncated stream must flip complete")
    assert(t.text.contains("doc-2-p0"))
  }

  test("quarantine: non-PDFs are None; truncation and byte damage " +
    "never throw and never fabricate completeness") {
    assert(Pdf.extract(null).isEmpty)
    assert(Pdf.extract("not a pdf at all - nope".getBytes).isEmpty)
    assert(Pdf.extract("<html><body>hi</body></html>".getBytes).isEmpty)
    val base = PdfFixtures.pdf(7L)
    for (len <- Seq(16, 100, base.length / 2, base.length - 3)) {
      val t = Pdf.extract(java.util.Arrays.copyOf(base, len))
      assert(t.isEmpty || !t.get.complete || t.get.text.nonEmpty)
    }
    var i = 0
    while (i < base.length) {
      val m = base.clone()
      m(i) = (m(i) ^ 0x5a).toByte
      Pdf.extract(m) // must not throw
      i += 37
    }
  }

  test("decompression budget: an inflating bomb degrades to " +
    "complete=false with bounded memory, never an OOM") {
    // A stream of 4 MiB of zeros deflates to ~4 KiB; with a 1 MiB
    // budget the inflate must refuse.
    val zeros = new Array[Byte](4 << 20)
    val d = new java.util.zip.Deflater()
    d.setInput(zeros); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val body = out.toByteArray
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n" +
      s"2 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ body ++
      "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val e = Pdf.extract(pdf, maxInflatedBytes = 1 << 20)
    assert(e.isDefined && !e.get.complete,
      "bomb must degrade honestly, not inflate")
    // Same stream under a sufficient budget inflates fine.
    assert(Pdf.extract(pdf, maxInflatedBytes = 8 << 20).isDefined)
  }
}
