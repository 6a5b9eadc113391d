package graft.operators

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** DOCX text extraction — the second document-ingestion format after
  * [[Pdf]]: OOXML (ECMA-376) wraps WordprocessingML in a zip, both of
  * which the JDK reads natively (`java.util.zip`, StAX). Extraction
  * is the standard w:t walk: text runs concatenate, `w:p` paragraph
  * ends emit newlines, `w:tab`/`w:br` emit their characters.
  *
  * Quarantine/robustness contract: not-a-zip, no `word/document.xml`
  * member, or malformed XML → None; the zip member inflates under a
  * DECOMPRESSION budget (a 4 GB zip bomb must not OOM an executor —
  * the same posture as [[Flac.decode]]/[[Pdf.extract]]); DTDs and
  * external entities are disabled on the XML reader (a crawled docx
  * must not be able to make the executor fetch URLs or expand
  * billion-laughs bombs). Scale shape: narrow per-row kernel.
  */
object OfficeDoc {

  final case class DocxText(nParagraphs: Int, text: String)

  /** Bounded read of one zip member; None past the budget. */
  private def readMember(zin: ZipInputStream,
      maxBytes: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(1 << 14)
    val buf = new Array[Byte](8192)
    var n = zin.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > maxBytes) return None
      n = zin.read(buf)
    }
    Some(out.toByteArray)
  }

  def docxText(b: Array[Byte],
      maxInflatedBytes: Int = 64 << 20): Option[DocxText] =
    try docxStrict(b, maxInflatedBytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def docxStrict(b: Array[Byte], maxBytes: Int): Option[DocxText] = {
    if (b == null || b.length < 22) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val zin = new ZipInputStream(new ByteArrayInputStream(b))
    try {
      var entry = zin.getNextEntry
      var xml: Array[Byte] = null
      while (entry != null && xml == null) {
        if (entry.getName == "word/document.xml")
          xml = readMember(zin, maxBytes).orNull
        entry = zin.getNextEntry
      }
      if (xml == null) return None
      parseDocumentXml(xml)
    } finally zin.close()
  }

  private def parseDocumentXml(xml: Array[Byte]): Option[DocxText] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
      val out = new StringBuilder
      var nPar = 0
      var inT = false
      var sawBody = false
      var parOpen = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            val ln = r.getLocalName
            val ns = r.getNamespaceURI
            if (ns == W) ln match {
              case "body" => sawBody = true
              case "p" => nPar += 1; parOpen = true
              case "t" => inT = true
              case "tab" => if (parOpen) out.append('\t')
              case "br" => if (parOpen) out.append('\n')
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            val ln = r.getLocalName
            if (r.getNamespaceURI == W) ln match {
              case "t" => inT = false
              case "p" => parOpen = false; out.append('\n')
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
              javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inT) out.append(r.getText)
          case _ => ()
        }
      }
      if (!sawBody) None
      else {
        // Paragraph ends append '\n'; drop the trailing one so text
        // joins paragraphs rather than terminating them.
        val t = out.result()
        Some(DocxText(nPar, if (t.endsWith("\n")) t.dropRight(1) else t))
      }
    } finally r.close()
  }

  /** Column form: struct(n_paragraphs, text); null = not a docx. */
  def docx(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      docxText(b).map(d => (d.nParagraphs, d.text))
    }
    f(blob).cast("struct<n_paragraphs:int,text:string>")
  }
}

/** Minimal conformant OOXML fixture: a zip with [Content_Types].xml,
  * the package rels, and a WordprocessingML document whose paragraph
  * text is pure doc arithmetic ([[paragraph]]). Runs split mid-
  * paragraph (two w:t per paragraph, one space-preserving) plus a
  * w:tab — the structures a naive regex-over-xml extractor gets
  * wrong and the StAX walk must get right.
  */
object DocxFixtures {
  private val W =
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Expected text of paragraph p (the oracle's arithmetic). */
  def paragraph(docId: Long, p: Int): String =
    s"para-$docId-$p\tbody ${(docId + p) % 9}"

  def docx(docId: Long): Array[Byte] = {
    val nPar = 2 + (docId % 4).toInt
    val paras = (0 until nPar).map { p =>
      val k = (docId + p) % 9
      s"""<w:p><w:r><w:t>para-$docId-$p</w:t></w:r>""" +
        s"""<w:r><w:tab/><w:t xml:space="preserve">body </w:t></w:r>""" +
        s"""<w:r><w:t>$k</w:t></w:r></w:p>"""
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<w:document xmlns:w="$W"><w:body>$paras</w:body></w:document>"""
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        """</Types>"""
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        """</Relationships>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    // Deterministic archive: fixed timestamps, stable entry order.
    def add(name: String, content: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    add("[Content_Types].xml", types)
    add("_rels/.rels", rels)
    add("word/document.xml", doc)
    z.close()
    out.toByteArray
  }
}
