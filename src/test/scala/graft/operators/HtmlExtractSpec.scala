package graft.operators

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {

  import HtmlExtract.extract

  test("basic extraction: blocks, inline tags, entities, whitespace") {
    val e = extract("<html><body><p>Hello   <b>bold</b> world</p>" +
      "<p>Q &amp; A &lt;tag&gt; &#65;&#x42;</p></body></html>")
    assert(e.text == "Hello bold world\nQ & A <tag> AB")
    assert(e.nBlocks == 2 && e.nDropped == 0)
  }

  test("script/style/head drop entirely, including raw '<' inside") {
    val e = extract("<head><title>t</title><style>.x{}</style></head>" +
      "<body><script>if (1 < 2) { x = '</p>'; }</script><p>kept</p>")
    assert(e.text == "kept")
    // Case-insensitive close tags; truncated raw text drops to EOF.
    assert(extract("<SCRIPT>var x;</ScRiPt><p>ok</p>").text == "ok")
    assert(extract("<script>never closed <p>gone").text == "")
  }

  test("link-density boilerplate rule") {
    // Short link-heavy nav: dropped.
    val nav = extract("<nav><a>Home</a> <a>About</a></nav><p>content</p>")
    assert(nav.text == "content" && nav.nDropped == 1 && nav.nLinks == 2)
    // A long link list with prose survives (length is evidence).
    val longList = "<div>" + ("<a>some linked phrase</a> " * 10) + "</div>"
    val e = extract(longList)
    assert(e.nDropped == 0 && e.nBlocks == 1)
    // Prose with one inline link is content, not boilerplate.
    val prose = extract("<p>read the <a>docs</a> for much more detail " +
      "about everything here</p>")
    assert(prose.nDropped == 0 && prose.text.contains("docs"))
  }

  test("review fixes: emoji entities, implicit </head>, quoted '>'") {
    // Supplementary-plane numeric reference decodes via surrogate
    // pair, not 16-bit truncation.
    assert(extract("<p>hi &#128512; &#x1F600;</p>").text ==
      "hi 😀 😀")
    // Out-of-range / surrogate refs pass through literally.
    assert(extract("<p>&#xD800; &#1114112;</p>").text ==
      "&#xD800; &#1114112;")
    // HTML5 head close-tag omission: <body> ends the head implicitly.
    assert(extract("<html><head><title>x</title><body><p>article</p>")
      .text == "article")
    // ...but a script inside the unclosed head still drops fully.
    assert(extract("<head><script>a<b</script><body><p>ok</p>").text
      == "ok")
    // Quoted '>' inside attributes does not end the tag.
    assert(extract("<p><img alt=\"a > b\">text</p>").text == "text")
    assert(extract("<div onclick=\"if(a>b)f()\"><p>x</p>").text == "x")
  }

  test("close-tag name boundary (HTML5 §13.2.5): prefix is not a match") {
    // </scripted> must NOT end a <script> — only </script followed by
    // '>', '/', or whitespace does (the r10 ADVICE finding).
    assert(extract("<script>a=1;</scripted>leak;</script><p>ok</p>")
      .text == "ok")
    // Whitespace and self-closing forms DO end it.
    assert(extract("<script>x</script ><p>a</p>").text == "a")
    assert(extract("<script>x</script\n><p>a</p>").text == "a")
    // A <bodytext> custom element must NOT end an unclosed <head>;
    // the real <body> after it does.
    assert(extract("<head><bodytext>nav</bodytext><title>t</title>" +
      "<body><p>prose</p>").text == "prose")
    // <body/> and <body attr> still exit the head.
    assert(extract("<head><title>t</title><body class=x><p>y</p>")
      .text == "y")
  }

  test("comments, truncation, null") {
    assert(extract("<p>a</p><!-- <p>not this</p> --><p>b</p>").text == "a\nb")
    assert(extract("<p>trunc<").text == "trunc")
    assert(extract(null).text == null)
    assert(extract("").text == "")
  }
}
