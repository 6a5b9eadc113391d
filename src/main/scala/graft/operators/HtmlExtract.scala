package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction with boilerplate dropping — the step
  * between archive ingest ([[Warc]]) and every text operator in the
  * engine: crawl payloads are markup, and the corpus the pipeline
  * curates is their extracted prose. One bounded single-pass
  * tokenizer (no DOM, no external parser):
  *
  *  - `<script>`/`<style>`/`<template>` elements, comments, and the
  *    entire `<head>` are dropped (metadata, not prose).
  *  - Block-level tags delimit BLOCKS; inline tags vanish; entities
  *    decode (named core set + numeric, hex and decimal).
  *  - Boilerplate rule (the public link-density heuristic of the
  *    boilerpipe/trafilatura family): a block whose anchor-text
  *    fraction exceeds [[LinkDensityMax]] AND whose text is shorter
  *    than [[ShortBlockChars]] is navigation, not content — dropped,
  *    counted. Long link-heavy blocks (link lists with prose) are
  *    kept: length is evidence of content.
  *  - Whitespace inside a block collapses to single spaces; blocks
  *    join with '\n'.
  *
  * Scale shape: narrow per-row map, one scan per document, no
  * shuffle — the same class as the tokenizer kernels downstream.
  */
object HtmlExtract {

  val LinkDensityMax = 0.66
  val ShortBlockChars = 80

  final case class Extracted(text: String, nBlocks: Int, nDropped: Int,
      nLinks: Int)

  private val BlockTags = Set("p", "div", "br", "li", "ul", "ol", "tr",
    "table", "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
    "header", "footer", "nav", "aside", "blockquote", "pre", "hr",
    "body", "html", "main", "figure", "figcaption", "dd", "dt", "dl")

  private val DropElements = Set("script", "style", "template", "head")

  private val Entities = Map("amp" -> '&'.toInt, "lt" -> '<'.toInt,
    "gt" -> '>'.toInt, "quot" -> '"'.toInt, "apos" -> '\''.toInt,
    "nbsp" -> ' '.toInt)

  /** Decode to a CODE POINT (not a char): `&#128512;`-class
    * supplementary-plane references are routine web text (emoji) and
    * a 16-bit truncation would silently substitute an unrelated BMP
    * char. Out-of-range and surrogate values refuse (the entity then
    * passes through literally).
    */
  private def decodeEntity(s: String): Option[Int] = {
    val cp =
      if (s.startsWith("#x") || s.startsWith("#X"))
        scala.util.Try(Integer.parseInt(s.substring(2), 16)).toOption
      else if (s.startsWith("#"))
        scala.util.Try(s.substring(1).toInt).toOption
      else Entities.get(s)
    cp.filter(c => c > 0 && c <= 0x10FFFF && !(c >= 0xD800 && c <= 0xDFFF))
  }

  /** The tag's closing '>' from `from` (just past '<'), honoring
    * quoted attribute values — `<img alt="a > b">` ends at the OUTER
    * '>', or the quoted remainder leaks into extracted text. -1 when
    * the tag never closes (truncated payload).
    */
  private def tagEnd(html: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  /** Extract; null-safe. Unclosed structures behave as if closed at
    * end-of-input (crawl payloads are routinely truncated).
    */
  def extract(html: String): Extracted = {
    if (html == null) return Extracted(null, 0, 0, 0)
    val n = html.length
    val out = new StringBuilder
    val block = new StringBuilder
    var blockAnchorChars = 0
    var anchorDepth = 0
    var dropDepth = 0 // inside script/style/template/head
    var dropTag = "" // the element that opened the drop (closes it)
    var nBlocks = 0
    var nDropped = 0
    var nLinks = 0

    def flushBlock(): Unit = {
      // Collapse whitespace; judge link density on the collapsed text.
      val t = block.toString.split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (t.nonEmpty) {
        val density = blockAnchorChars.toDouble / math.max(1, block.count(
          !_.isWhitespace))
        if (density > LinkDensityMax && t.length < ShortBlockChars)
          nDropped += 1
        else {
          if (out.nonEmpty) out.append('\n')
          out.append(t)
          nBlocks += 1
        }
      }
      block.setLength(0)
      blockAnchorChars = 0
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (dropDepth > 0) {
        // Raw-text / dropped element: ONLY the literal close tag ends
        // it (HTML5 §13.2.5.6 script/style data states — "1 < 2"
        // inside a script is text, not a tag). Same-tag nesting inside
        // a dropped element is not tracked (HTML5 script/style cannot
        // nest; a nested <template> would end at the first close).
        // HTML5 §13.2.5: the close-tag NAME must be followed by
        // whitespace, '/', or '>' — a prefix match alone would let
        // `</scripted>` end a <script> and leak script text into prose.
        def tagNameBoundary(at: Int): Boolean =
          at < n && {
            val ch = html.charAt(at)
            ch == '>' || ch == '/' || Character.isWhitespace(ch)
          }
        if (c == '<' && i + 2 + dropTag.length < n &&
          html.charAt(i + 1) == '/' &&
          html.regionMatches(true, i + 2, dropTag, 0, dropTag.length) &&
          tagNameBoundary(i + 2 + dropTag.length)) {
          val close = tagEnd(html, i + 1)
          i = if (close < 0) n else close + 1
          dropDepth = 0
        } else if (c == '<' && dropTag == "head" &&
          html.regionMatches(true, i + 1, "body", 0, 4) &&
          tagNameBoundary(i + 5)) {
          // HTML5 permits omitting </head>: <body> ends the head
          // implicitly. Leave the tag for the main loop to consume —
          // only script/style/template hold the strict raw-text rule.
          dropDepth = 0
        } else i += 1
      } else if (c == '<') {
        // Comment?
        if (i + 3 < n && html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = tagEnd(html, i + 1)
          if (close < 0) { i = n } // truncated tag: stop
          else {
            val inner = html.substring(i + 1, close).trim
            val isEnd = inner.startsWith("/")
            val name0 = (if (isEnd) inner.substring(1) else inner)
              .takeWhile(ch => ch.isLetterOrDigit)
              .toLowerCase
            if (!isEnd && DropElements.contains(name0) &&
              !inner.endsWith("/")) {
              dropDepth = 1; dropTag = name0
            } else if (name0 == "a") {
              if (isEnd) anchorDepth = math.max(0, anchorDepth - 1)
              else { anchorDepth += 1; nLinks += 1 }
            } else if (BlockTags.contains(name0)) {
              flushBlock()
            }
            i = close + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 9) {
          decodeEntity(html.substring(i + 1, semi)) match {
            case Some(cp) =>
              block.appendAll(Character.toChars(cp))
              if (anchorDepth > 0 && !Character.isWhitespace(cp))
                blockAnchorChars += 1
              i = semi + 1
            case None => block.append(c); i += 1
          }
        } else { block.append(c); i += 1 }
      } else {
        block.append(c)
        if (anchorDepth > 0 && !c.isWhitespace) blockAnchorChars += 1
        i += 1
      }
    }
    flushBlock()
    Extracted(out.toString, nBlocks, nDropped, nLinks)
  }

  /** struct(text, n_blocks, n_dropped, n_links); null html → null. */
  def htmlText(html: Column): Column = {
    val f = udf { s: String =>
      if (s == null) None
      else {
        val e = extract(s)
        Some((e.text, e.nBlocks, e.nDropped, e.nLinks))
      }
    }
    f(html).cast("struct<text:string,n_blocks:int,n_dropped:int," +
      "n_links:int>")
  }
}
