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
    val r = safeFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
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

  // ---- XLSX (SpreadsheetML) ------------------------------------------

  /** One sheet row: (row index as the sheet numbers them, tab-joined
    * cell values in document order).
    */
  final case class SheetRow(row: Int, text: String)

  /** XLSX cell extraction: shared strings resolved, inline/numeric
    * values kept verbatim (the `<v>` literal — spreadsheet numbers
    * are data, reformatting them would corrupt). Same quarantine and
    * budget posture as [[docxText]]; sheet1 only (the corpus-scale
    * table case; multi-sheet workbooks concatenate upstream).
    */
  def xlsxRows(b: Array[Byte],
      maxInflatedBytes: Int = 64 << 20): Option[Seq[SheetRow]] =
    try xlsxStrict(b, maxInflatedBytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def xlsxStrict(b: Array[Byte],
      maxBytes: Int): Option[Seq[SheetRow]] = {
    if (b == null || b.length < 22) return None
    if (!(b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4)) return None
    val zin = new ZipInputStream(new ByteArrayInputStream(b))
    var shared: Array[Byte] = null
    var sheet: Array[Byte] = null
    try {
      var entry = zin.getNextEntry
      while (entry != null && (shared == null || sheet == null)) {
        entry.getName match {
          case "xl/sharedStrings.xml" =>
            shared = readMember(zin, maxBytes).orNull
          case "xl/worksheets/sheet1.xml" =>
            sheet = readMember(zin, maxBytes).orNull
          case _ => ()
        }
        entry = zin.getNextEntry
      }
    } finally zin.close()
    if (sheet == null) return None
    val strings: IndexedSeq[String] =
      if (shared == null) IndexedSeq.empty else parseSharedStrings(shared)
    parseSheet(sheet, strings)
  }

  // One factory per executor thread: XMLInputFactory.newInstance()
  // does a service lookup per call (it dominated the per-row parse
  // cost at bench), and factories are not documented thread-safe, so
  // a plain shared instance is not an option either.
  private val factoryTl =
    new ThreadLocal[javax.xml.stream.XMLInputFactory] {
      override def initialValue(): javax.xml.stream.XMLInputFactory = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
        f.setProperty(
          javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
          false)
        f
      }
    }
  private[operators] def safeFactory(): javax.xml.stream.XMLInputFactory =
    factoryTl.get()

  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = safeFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" => inT = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = false; out += cur.result()
              case "t" => inT = false
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
              javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inSi && inT) cur.append(r.getText)
          case _ => ()
        }
      }
      out.result()
    } finally r.close()
  }

  private def parseSheet(xml: Array[Byte],
      strings: IndexedSeq[String]): Option[Seq[SheetRow]] = {
    val r = safeFactory().createXMLStreamReader(new ByteArrayInputStream(xml))
    try {
      val rows = Vector.newBuilder[SheetRow]
      var rowIx = 0
      var cells: scala.collection.mutable.ArrayBuffer[String] = null
      var cellType = ""
      var inV = false
      val v = new StringBuilder
      var sawSheetData = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "sheetData" => sawSheetData = true
              case "row" =>
                rowIx = Option(r.getAttributeValue(null, "r"))
                  .map(_.toInt).getOrElse(rowIx + 1)
                cells = scala.collection.mutable.ArrayBuffer.empty[String]
              case "c" =>
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              case "v" => inV = true; v.clear()
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" =>
                inV = false
                if (cells != null) {
                  val raw = v.result()
                  cells += (if (cellType == "s")
                    strings.lift(raw.trim.toInt).getOrElse("")
                  else raw)
                }
              case "row" =>
                if (cells != null) rows += SheetRow(rowIx, cells.mkString("\t"))
                cells = null
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
              javax.xml.stream.XMLStreamConstants.CDATA =>
            if (inV) v.append(r.getText)
          case _ => ()
        }
      }
      if (!sawSheetData) None else Some(rows.result())
    } finally r.close()
  }

  /** Generator column form: array of (row, text) sheet rows; null =
    * quarantine (not an xlsx), distinct from an empty sheet.
    */
  def xlsx(blob: Column): Column = {
    val f = udf { b: Array[Byte] =>
      xlsxRows(b).map(_.map(r => (r.row, r.text)))
    }
    f(blob).cast("array<struct<row:int,text:string>>")
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

  /** Expected tab-joined text of sheet row r (1-based; the oracle's
    * arithmetic): a shared-string label cell then numeric cells.
    */
  def xlsxRowText(docId: Long, r: Int): String = {
    val nCols = 2 + (docId % 3).toInt
    (s"cell-$docId-$r" +:
      (1 until nCols).map(c => ((docId + r * c) % 100).toString))
      .mkString("\t")
  }

  /** Minimal conformant XLSX: shared strings (label cells, one per
    * row) + sheet1 with numeric `<v>` cells — 1 + docId%5 rows of
    * 2 + docId%3 columns.
    */
  def xlsx(docId: Long): Array[Byte] = {
    val nRows = 1 + (docId % 5).toInt
    val nCols = 2 + (docId % 3).toInt
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="$nRows" uniqueCount="$nRows">""" +
        (1 to nRows).map(r => s"<si><t>cell-$docId-$r</t></si>").mkString +
        "</sst>"
    val colName = "ABCDEFGH"
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        (1 to nRows).map { r =>
          val cells = s"""<c r="A$r" t="s"><v>${r - 1}</v></c>""" +
            (1 until nCols).map { c =>
              s"""<c r="${colName(c)}$r"><v>${(docId + r * c) % 100}</v></c>"""
            }.mkString
          s"""<row r="$r">$cells</row>"""
        }.mkString +
        "</sheetData></worksheet>"
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    def add(name: String, content: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(0L)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    add("[Content_Types].xml", types)
    add("xl/sharedStrings.xml", sst)
    add("xl/worksheets/sheet1.xml", sheet)
    z.close()
    out.toByteArray
  }
}
