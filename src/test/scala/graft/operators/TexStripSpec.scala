package graft.operators

import graft.SparkSpec

class TexStripSpec extends SparkSpec {

  test("fixture cleans to the pinned expected text; math and env " +
    "counts track the variants") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 6L, 123L)) {
      val t = TexStrip.latexText(TexStrip.fixture(docId)).get
      assert(t.text == TexStrip.fixtureExpected(docId),
        s"doc $docId:\n${t.text}\n-- want --\n${TexStrip.fixtureExpected(docId)}")
      assert(t.nMath == 1 + (docId % 2).toInt)
      assert(t.nEnvsDropped == 1 + (if (docId % 3 == 0) 1 else 0))
    }
  }

  test("rule pins: comments, escapes, nesting, drop-arg commands, " +
    "unclosed structures keep the good prefix") {
    def s(x: String): String = TexStrip.latexText(x).get.text
    assert(s("a \\% of b % gone\nc") == "a % of b\nc")
    assert(s("pre\\begin{itemize}mid\\end{itemize}post") == "premidpost")
    // Same-name nesting in a dropped env.
    assert(s("a\\begin{table}x\\begin{table}y\\end{table}z\\end{table}b")
      == "ab")
    // Drop-arg with optional argument.
    assert(s("see \\includegraphics[width=2cm]{fig.png} now") == "see now")
    // Generic command keeps its brace-group text.
    assert(s("\\emph{kept} and \\unknowncmd{also kept}") == "kept and also kept")
    // Bare command gobbles one space.
    assert(s("\\LaTeX is nice") == "is nice")
    // Unclosed math drops the tail, keeps the prefix.
    assert(s("good $x + y") == "good")
    assert(TexStrip.latexText("a $m$ b").get.nMath == 1)
    // Escaped dollar is a literal, not math.
    assert(s("price \\$5") == "price $5")
    // \( .. \) inline form.
    assert(s("x \\(a+b\\) y") == "x y")
    assert(TexStrip.latexText(null).isEmpty)
  }
}
