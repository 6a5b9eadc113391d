package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** LaTeX source cleaning — the arXiv-corpus preprocessing op: strip
  * the markup, keep the prose. Scientific TeX is one of the
  * highest-value pretraining sources and ships as source, so a
  * pipeline needs a deterministic text extraction with PINNED rules
  * (not "whatever a renderer does"):
  *
  *  - only the `\begin{document}`..`\end{document}` body is prose
  *    (the preamble is configuration);
  *  - unescaped `%` comments drop to end of line;
  *  - math is NOT prose: `$..$`, `$$..$$`, `\(..\)`, `\[..\]` and the
  *    display-math ENVIRONMENT family drop entirely (counted — the
  *    math density is itself a quality signal);
  *  - float/verbatim environments (figure/table/tabular/verbatim/
  *    tikzpicture/listing) drop entirely, WITH same-name nesting;
  *    other environment markers (itemize, abstract, center, …) drop
  *    but their content survives;
  *  - commands lose their control word; brace groups lose only the
  *    braces — so `\textbf{bold}` and `\section{Title}` keep their
  *    text with zero per-command configuration — EXCEPT the
  *    reference/configuration commands whose argument is not prose
  *    (`\cite`, `\ref`, `\label`, `\usepackage`, `\includegraphics`,
  *    …), which drop their groups;
  *  - `\\` is a line break, `\%`-style escapes are literals, `~` is a
  *    space, `\item` renders "- ";
  *  - whitespace normalizes: every run collapses to one space, or one
  *    newline if the run contained one; ends trim.
  *
  * Returns (text, n_math, n_envs_dropped); null input → None. A
  * malformed document (unclosed math/environment) keeps everything
  * before the breakage — the dirty-input posture. Scale shape: one
  * narrow per-row map.
  */
object TexStrip {

  final case class TexText(text: String, nMath: Int, nEnvsDropped: Int)

  /** Environments whose CONTENT is not prose. */
  private val DropEnvs = Set("equation", "align", "gather", "multline",
    "eqnarray", "displaymath", "math", "figure", "table", "tabular",
    "verbatim", "lstlisting", "tikzpicture", "minted")

  /** Commands whose brace argument is reference/configuration, not
    * prose.
    */
  private val DropArg = Set("cite", "citep", "citet", "ref", "eqref",
    "pageref", "label", "usepackage", "documentclass", "includegraphics",
    "bibliography", "bibliographystyle", "input", "include", "vspace",
    "hspace", "setlength", "newcommand", "renewcommand", "definecolor")

  def latexText(src0: String): Option[TexText] = {
    if (src0 == null) return None
    try Some(strip(src0)) catch { case scala.util.control.NonFatal(_) => None }
  }

  private def strip(src0: String): TexText = {
    var src = src0
    val bd = src.indexOf("\\begin{document}")
    if (bd >= 0) src = src.substring(bd + 16)
    val ed = src.indexOf("\\end{document}")
    if (ed >= 0) src = src.substring(0, ed)
    val len = src.length
    val out = new StringBuilder
    var nMath = 0
    var nEnvs = 0
    var i = 0

    // The index just past a balanced {..} group starting at `at` (which
    // must be '{'); nesting respected; unclosed → end of input.
    def pastGroup(at: Int): Int = {
      if (at >= len || src.charAt(at) != '{') return at
      var d = 0
      var j = at
      while (j < len) {
        val c = src.charAt(j)
        if (c == '\\' && j + 1 < len) j += 2
        else {
          if (c == '{') d += 1
          else if (c == '}') { d -= 1; if (d == 0) return j + 1 }
          j += 1
        }
      }
      len
    }
    // Group content (braces off) for \begin/\end names.
    def groupName(at: Int): (String, Int) = {
      if (at < len && src.charAt(at) == '{') {
        val end = pastGroup(at)
        (src.substring(at + 1, math.max(at + 1, end - 1)), end)
      } else ("", at)
    }

    while (i < len) {
      val c = src.charAt(i)
      if (c == '%') {
        while (i < len && src.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        nMath += 1
        if (i + 1 < len && src.charAt(i + 1) == '$') {
          val close = src.indexOf("$$", i + 2)
          i = if (close < 0) len else close + 2
        } else {
          var j = i + 1
          var found = -1
          while (j < len && found < 0) {
            val cj = src.charAt(j)
            if (cj == '\\') j += 2
            else if (cj == '$') found = j
            else j += 1
          }
          i = if (found < 0) len else found + 1
        }
      } else if (c == '~') { out.append(' '); i += 1 }
      else if (c == '{' || c == '}') i += 1
      else if (c == '\\') {
        if (i + 1 >= len) i = len
        else {
          val n = src.charAt(i + 1)
          if (n == '\\') { out.append('\n'); i += 2 }
          else if ("%&$#_{}".indexOf(n) >= 0) { out.append(n); i += 2 }
          else if (n == '[') {
            nMath += 1
            val close = src.indexOf("\\]", i + 2)
            i = if (close < 0) len else close + 2
          } else if (n == '(') {
            nMath += 1
            val close = src.indexOf("\\)", i + 2)
            i = if (close < 0) len else close + 2
          } else if (n == ' ') { out.append(' '); i += 2 }
          else if (n.isLetter) {
            var j = i + 1
            while (j < len && src.charAt(j).isLetter) j += 1
            val name = src.substring(i + 1, j)
            if (j < len && src.charAt(j) == '*') j += 1
            name match {
              case "begin" =>
                val (env, after) = groupName(j)
                val envBase = env.stripSuffix("*")
                if (DropEnvs.contains(envBase)) {
                  nEnvs += 1
                  // Find the matching \end{env}, counting same-name
                  // nesting; unclosed → drop the rest.
                  val b = s"\\begin{$env}"
                  val e = s"\\end{$env}"
                  var depth = 1
                  var k = after
                  while (depth > 0 && k < len) {
                    val nb = src.indexOf(b, k)
                    val ne = src.indexOf(e, k)
                    if (ne < 0) { depth = 0; k = len }
                    else if (nb >= 0 && nb < ne) { depth += 1; k = nb + b.length }
                    else { depth -= 1; k = ne + e.length }
                  }
                  i = k
                } else i = after // marker dropped, content kept
              case "end" =>
                val (_, after) = groupName(j)
                i = after
              case "item" =>
                out.append("\n- ")
                i = if (j < len && src.charAt(j) == ' ') j + 1 else j
              case nm if DropArg.contains(nm) =>
                // Drop optional [..] then every consecutive {..} group.
                var k = j
                if (k < len && src.charAt(k) == '[') {
                  val cb = src.indexOf(']', k)
                  k = if (cb < 0) len else cb + 1
                }
                while (k < len && src.charAt(k) == '{') k = pastGroup(k)
                i = k
              case _ =>
                // Token dropped; TeX gobbles the following space.
                i = if (j < len && src.charAt(j) == ' ') j + 1 else j
            }
          } else i += 2 // unknown escape: drop both
        }
      } else { out.append(c); i += 1 }
    }

    // Whitespace normalization: runs → ' ' or '\n'; trim.
    val raw = out.result()
    val norm = new StringBuilder
    var k = 0
    while (k < raw.length) {
      val c = raw.charAt(k)
      if (c.isWhitespace) {
        var hasNl = false
        while (k < raw.length && raw.charAt(k).isWhitespace) {
          if (raw.charAt(k) == '\n') hasNl = true
          k += 1
        }
        if (norm.nonEmpty && k < raw.length)
          norm.append(if (hasNl) '\n' else ' ')
      } else { norm.append(c); k += 1 }
    }
    TexText(norm.result(), nMath, nEnvs)
  }

  /** Column form: struct(text, n_math, n_envs_dropped); null in →
    * null out.
    */
  def latex(src: Column): Column = {
    val f = udf { s: String =>
      latexText(s).map(t => (t.text, t.nMath, t.nEnvsDropped))
    }
    f(src).cast("struct<text:string,n_math:int,n_envs_dropped:int>")
  }

  /** Deterministic fixture: a small article whose cleaned text the
    * SQL oracle rebuilds by string arithmetic. Odd docs add display
    * math; docs ≡ 0 (mod 3) add a dropped table environment.
    */
  def fixture(docId: Long): String = {
    val k = docId % 7
    val dollar = "$"
    val display = if (docId % 2 == 1)
      s"Display $dollar$dollar z_{$docId} $dollar$dollar here.\n" else ""
    val table = if (docId % 3 == 0)
      s"\\begin{table}\n\\begin{tabular}{cc}\na & b \\\\\n" +
        s"\\end{tabular}\n\\end{table}\n" else ""
    s"""\\documentclass{article}
       |\\usepackage{amsmath}
       |% preamble comment
       |\\begin{document}
       |\\section{Doc $docId}
       |Intro text-$k with $dollar x^2 + y_$docId $dollar inline math and \\textbf{bold-$docId} words. % trailing
       |$display\\begin{equation}
       |E = mc^2 + $docId
       |\\end{equation}
       |${table}After equation \\cite{ref$docId} done.
       |\\begin{itemize}
       |\\item alpha-$docId
       |\\item beta-$k
       |\\end{itemize}
       |Final\\\\
       |line-$docId.
       |\\end{document}
       |""".stripMargin
  }

  /** The fixture's expected cleaned text (spec + oracle contract). */
  def fixtureExpected(docId: Long): String = {
    val k = docId % 7
    val display = if (docId % 2 == 1) "Display here.\n" else ""
    s"Doc $docId\nIntro text-$k with inline math and bold-$docId words.\n" +
      display +
      s"After equation done.\n- alpha-$docId\n- beta-$k\nFinal\nline-$docId."
  }
}
