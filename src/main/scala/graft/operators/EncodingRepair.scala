package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake detection/repair — the encoding-damage cleaning pass of a
  * web-scale text pipeline (the core loop of the public `ftfy` idea):
  * text that was UTF-8 ENCODED, then mis-DECODED as CP1252/Latin-1,
  * carries artifact runs like "Ã©" (é), "â€™" ('), "Ã¼" (ü). The
  * repair inverts the damage exactly where it is provable: map each
  * char back to its CP1252 byte, and where a maximal run of such
  * bytes forms a VALID UTF-8 sequence (no overlong forms, no
  * surrogates, ≤ U+10FFFF), substitute the decoded character;
  * everything else passes through untouched, so clean text — ASCII or
  * legitimate accented text that never round-tripped — is a fixed
  * point. One deterministic pass, no heuristics beyond UTF-8 validity
  * itself.
  *
  * Scale shape: a narrow per-row map (bounded single scan per
  * document), no shuffle — the same class as the tokenizer/quality
  * kernels it runs beside.
  */
object EncodingRepair {

  /** Unicode → CP1252 byte for the 0x80-0x9F graphic block (the 27
    * chars Windows-1252 maps differently from ISO-8859-1; the other
    * 5 slots are undefined in CP1252). Chars U+00A0..U+00FF map to
    * their own byte value; everything else has no CP1252 byte.
    */
  private val Cp1252Inverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83,
    '„' -> 0x84, '…' -> 0x85, '†' -> 0x86,
    '‡' -> 0x87, 'ˆ' -> 0x88, '‰' -> 0x89,
    'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '•' -> 0x95,
    '–' -> 0x96, '—' -> 0x97, '˜' -> 0x98,
    '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** The byte this char would have been in the mis-decoded reading,
    * or -1 if it cannot have come from one. Chars ≤ U+00FF are their
    * own byte (covers BOTH Latin-1 mis-decodes — where 0x80-0x9F
    * surface as C1 controls — and the CP1252 pass-through range);
    * the fancy-quote block covers the CP1252 reading. The two inverse
    * images are disjoint, so accepting both widens coverage without
    * ambiguity.
    */
  private def cpByte(c: Char): Int =
    if (c <= 0xFF) c.toInt else Cp1252Inverse.getOrElse(c, -1)

  /** Repair one string: (fixed text, number of artifact sequences
    * replaced). Null-safe at the Column layer.
    */
  def fixMojibake(s: String): (String, Int) = {
    if (s == null) return (null, 0)
    val n = s.length
    var i = 0
    var fixed = 0
    val out = new java.lang.StringBuilder(n)
    while (i < n) {
      val lead = cpByte(s.charAt(i))
      // UTF-8 lead bytes C2..F4 (C0/C1 are always overlong).
      val cont = if (lead >= 0xC2 && lead <= 0xDF) 1
        else if (lead >= 0xE0 && lead <= 0xEF) 2
        else if (lead >= 0xF0 && lead <= 0xF4) 3
        else -1
      var done = false
      if (cont > 0 && i + cont < n) {
        var cp = cont match {
          case 1 => lead & 0x1f
          case 2 => lead & 0x0f
          case _ => lead & 0x07
        }
        var ok = true
        var k = 1
        while (ok && k <= cont) {
          val b = cpByte(s.charAt(i + k))
          if (b >= 0x80 && b <= 0xBF) cp = (cp << 6) | (b & 0x3f)
          else ok = false
          k += 1
        }
        // Validity: shortest-form only, no surrogates, in range.
        val minCp = cont match {
          case 1 => 0x80
          case 2 => 0x800
          case _ => 0x10000
        }
        if (ok && cp >= minCp && cp <= 0x10FFFF &&
          !(cp >= 0xD800 && cp <= 0xDFFF)) {
          out.appendCodePoint(cp)
          i += cont + 1
          fixed += 1
          done = true
        }
      }
      if (!done) {
        out.append(s.charAt(i))
        i += 1
      }
    }
    (out.toString, fixed)
  }

  /** struct(fixed string, n_fixed int) — null text passes through as
    * null with n_fixed 0.
    */
  def mojibakeRepair(text: Column): Column = {
    val f = udf { s: String =>
      val (t, k) = fixMojibake(s)
      (t, k)
    }
    f(text).cast("struct<fixed:string,n_fixed:int>")
  }
}
