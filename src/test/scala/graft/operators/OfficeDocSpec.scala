package graft.operators

import graft.SparkSpec

class OfficeDocSpec extends SparkSpec {

  test("fixture round trip: paragraphs, split runs, tabs, space " +
    "preservation") {
    for (docId <- Seq(0L, 1L, 3L, 42L, 9999L)) {
      val e = OfficeDoc.docxText(DocxFixtures.docx(docId)).get
      val nPar = 2 + (docId % 4).toInt
      assert(e.nParagraphs == nPar)
      val want = (0 until nPar)
        .map(p => DocxFixtures.paragraph(docId, p)).mkString("\n")
      assert(e.text == want, s"doc $docId:\n${e.text}\n-- want --\n$want")
    }
  }

  test("quarantine: non-zips, zips without the document part, " +
    "malformed XML, and zip bombs all return None, never throw") {
    assert(OfficeDoc.docxText(null).isEmpty)
    assert(OfficeDoc.docxText("PKjunk".getBytes).isEmpty)
    assert(OfficeDoc.docxText(PdfFixtures.pdf(1L)).isEmpty)
    // A zip that is not a docx (no word/document.xml).
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("hello".getBytes); z.closeEntry(); z.close()
    assert(OfficeDoc.docxText(out.toByteArray).isEmpty)
    // Malformed XML in the right member.
    val bad = new java.io.ByteArrayOutputStream()
    val zb = new java.util.zip.ZipOutputStream(bad)
    zb.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zb.write("<w:document><unclosed".getBytes); zb.closeEntry(); zb.close()
    assert(OfficeDoc.docxText(bad.toByteArray).isEmpty)
    // Zip bomb: 8 MiB of zeros in the member, 1 MiB budget.
    val bomb = new java.io.ByteArrayOutputStream()
    val zz = new java.util.zip.ZipOutputStream(bomb)
    zz.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    zz.write(new Array[Byte](8 << 20)); zz.closeEntry(); zz.close()
    assert(OfficeDoc.docxText(bomb.toByteArray,
      maxInflatedBytes = 1 << 20).isEmpty)
    // Truncation sweep: never throw.
    val good = DocxFixtures.docx(5L)
    for (len <- Seq(4, 30, good.length / 2, good.length - 5))
      OfficeDoc.docxText(java.util.Arrays.copyOf(good, len))
  }

  test("xlsx round trip: shared strings resolve, numeric values stay " +
    "verbatim, rows keep sheet order; quarantine for non-sheets") {
    for (docId <- Seq(0L, 1L, 4L, 77L, 1234L)) {
      val rows = OfficeDoc.xlsxRows(DocxFixtures.xlsx(docId)).get
      val nRows = 1 + (docId % 5).toInt
      assert(rows.length == nRows)
      for ((row, i) <- rows.zipWithIndex) {
        assert(row.row == i + 1)
        assert(row.text == DocxFixtures.xlsxRowText(docId, i + 1),
          s"doc $docId row ${i + 1}: ${row.text}")
      }
    }
    // A docx is not a spreadsheet; a pdf is not a zip.
    assert(OfficeDoc.xlsxRows(DocxFixtures.docx(1L)).isEmpty)
    assert(OfficeDoc.xlsxRows(PdfFixtures.pdf(1L)).isEmpty)
    // Out-of-range shared-string index degrades to empty, not a throw.
    val evil = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(evil)
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(("""<worksheet xmlns="http://schemas.openxmlformats.org/""" +
      """spreadsheetml/2006/main"><sheetData><row r="1">""" +
      """<c r="A1" t="s"><v>99</v></c></row></sheetData></worksheet>""")
      .getBytes)
    z.closeEntry(); z.close()
    val r = OfficeDoc.xlsxRows(evil.toByteArray).get
    assert(r.length == 1 && r.head.text == "")
  }

  test("XML safety: DTDs and external entities are refused") {
    val evil = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(evil)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(("""<?xml version="1.0"?><!DOCTYPE d [<!ENTITY x SYSTEM """ +
      """"file:///etc/passwd">]><w:document xmlns:w=""" +
      s""""http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:body><w:p><w:r><w:t>&x;</w:t></w:r></w:p></w:body>""" +
      """</w:document>""").getBytes)
    z.closeEntry(); z.close()
    val e = OfficeDoc.docxText(evil.toByteArray)
    // Either rejected outright or the entity is NOT expanded.
    assert(e.isEmpty || !e.get.text.contains("root:"))
  }
}
