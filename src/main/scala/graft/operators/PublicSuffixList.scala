package graft.operators

/** Public Suffix List — the published rule format and matching
  * algorithm of publicsuffix.org (the data file every browser and
  * crawler uses to cut registrable domains): plain rules (`com`,
  * `co.uk`), wildcard rules (`*.ck` — '*' matches exactly one label),
  * and exception rules (`!www.ck` — beats every other match; the
  * public suffix is the exception minus its leftmost label). Lines
  * starting with `//` are comments; a rule is the first whitespace
  * token of its line; rules match label-for-label from the right; when
  * nothing matches, the implicit default rule `*` makes the last label
  * the public suffix; the registrable domain is the public suffix plus
  * one label.
  *
  * A deployment loads the full published snapshot with [[fromFile]]
  * (both ICANN and private sections parse — they share the format);
  * [[embedded]] is the engine's bounded fallback subset, so per-site
  * grouping works out of the box and gets exact under a provided
  * file. Hosts are expected lowercase ASCII (punycoded) — the form
  * [[UrlNorm.canonicalize]] emits; non-ASCII (IDN) rules in a loaded
  * file are kept verbatim and match only equally-verbatim hosts.
  *
  * Instances are small immutable values (hash sets over rule strings)
  * and serialize into UDF closures like any other operator knob.
  */
final class PublicSuffixList private[operators] (
    private val exact: Set[String],
    private val wildcardParents: Set[String],
    private val exceptions: Set[String]) extends Serializable {

  /** Number of labels of `labels`' public suffix (labels are the
    * host's dot-split parts, left to right).
    */
  def publicSuffixLabels(labels: Array[String]): Int = {
    var best = 1 // the implicit default rule "*"
    var exc = -1
    var k = 1
    while (k <= labels.length) {
      val s = labels.takeRight(k).mkString(".")
      if (exceptions.contains(s)) exc = math.max(exc, k - 1)
      if (exact.contains(s) && k > best) best = k
      if (k >= 2 && wildcardParents.contains(
        labels.takeRight(k - 1).mkString(".")) && k > best) best = k
      k += 1
    }
    if (exc >= 0) exc else best // exceptions beat all other rules
  }

  /** Registrable domain: public suffix + one label. A host that IS a
    * public suffix (or shorter) has no registrable domain per spec —
    * returned whole so the function stays total for grouping keys.
    */
  def registrable(host: String): String = {
    val labels = host.split("\\.")
    val n = publicSuffixLabels(labels)
    if (labels.length <= n) host
    else labels.takeRight(n + 1).mkString(".")
  }
}

object PublicSuffixList {

  /** Parse rules in the published format from lines. */
  def parse(lines: Iterator[String]): PublicSuffixList = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0).toLowerCase
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else if (rule == "*") () // the implicit default, already built in
        else exact += rule
      }
    }
    new PublicSuffixList(exact.result(), wild.result(), exc.result())
  }

  /** Load a published-format snapshot — the deployment knob. */
  def fromFile(path: String): PublicSuffixList = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Bounded embedded fallback: the high-traffic multi-label suffixes.
    * Everything else falls to the default rule (last label), which is
    * correct for all single-label TLDs — the overwhelming bulk of a
    * crawl. A deployment swaps in the full snapshot via [[fromFile]].
    */
  val embedded: PublicSuffixList = parse(Iterator(
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au", "co.jp", "or.jp", "ne.jp", "co.kr",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "com.sg", "com.tw"))
}
