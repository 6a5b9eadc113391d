package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup KEY of a web corpus: the same
  * page arrives under scheme/case/port/fragment/tracking-parameter
  * variants, and exact URL dedup (or per-domain quotas, or takedown
  * matching) only works on a canonical form. One deterministic,
  * documented normal form (RFC 3986 §6 syntax-based normalization +
  * the standard tracking-parameter strip):
  *
  *  - scheme + host lowercased; default ports dropped (http:80,
  *    https:443); trailing host dot dropped.
  *  - path: percent-decoding of UNRESERVED characters only (§2.3 —
  *    %41→A; reserved octets stay encoded), dot-segment removal
  *    (§5.2.4), empty path → "/".
  *  - query: parameters sorted by (key, value); tracking keys
  *    (`utm_*`, `gclid`, `fbclid`, `msclkid`, `ref_src`) dropped;
  *    empty query dropped.
  *  - fragment dropped (never sent to the server).
  *
  * [[registrableDomain]] gives the per-site grouping key: the host
  * cut at its public suffix by [[PublicSuffixList]] rules (the
  * published plain/wildcard/exception format; the embedded bounded
  * subset by default, `PublicSuffixList.fromFile` loads a full
  * deployment snapshot).
  *
  * Scale shape: narrow per-row map, no shuffle.
  */
object UrlNorm {

  private val TrackingKeys: Set[String] =
    Set("gclid", "fbclid", "msclkid", "ref_src")
  private def isTracking(k: String): Boolean =
    k.startsWith("utm_") || TrackingKeys.contains(k)

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreserved(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  /** §2.3: decode %XX only for unreserved octets; uppercase the hex
    * of the ones that stay encoded (§6.2.2.1).
    */
  private def normPercent(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h >= 0 && l >= 0) {
          val b = h * 16 + l
          if (isUnreserved(b)) out.append(b.toChar)
          else out.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
          i += 3
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** §5.2.4 remove_dot_segments. */
  private def removeDots(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    val abs = path.startsWith("/")
    path.split("/", -1).foreach {
      case "" | "." =>
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    val tail = if (path.endsWith("/") || path.endsWith("/.") ||
      path.endsWith("/..")) "/" else ""
    val joined = out.mkString("/")
    (if (abs) "/" else "") + joined +
      (if (joined.nonEmpty && tail == "/") "/" else if (joined.isEmpty) "" else "")
  }

  /** Canonical form, or null for unparseable / non-http(s) input. */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val trimmed = url.trim
    val schemeEnd = trimmed.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = trimmed.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    var rest = trimmed.substring(schemeEnd + 3)
    // Strip fragment first (never part of the resource).
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val slash = rest.indexOf('/')
    val qmarkInAuth = rest.indexOf('?')
    val authEnd =
      if (slash < 0 && qmarkInAuth < 0) rest.length
      else if (slash < 0) qmarkInAuth
      else if (qmarkInAuth < 0) slash
      else math.min(slash, qmarkInAuth)
    var auth = rest.substring(0, authEnd).toLowerCase
    if (auth.isEmpty || auth.contains('@')) {
      // Userinfo URLs are a phishing shape more often than content;
      // refuse rather than canonicalize credentials into a key.
      if (auth.contains('@')) return null
      if (auth.isEmpty) return null
    }
    if (auth.endsWith(".")) auth = auth.dropRight(1)
    val colon = auth.lastIndexOf(':')
    if (colon >= 0 && auth.drop(colon + 1).forall(_.isDigit)) {
      val port = auth.substring(colon + 1)
      // RFC 3986 §6.2.3: the default port AND an EMPTY port ("host:")
      // are both equivalent to no port — keeping the dangling colon
      // would mint a second dedup key for the same page.
      val dflt = (scheme == "http" && port == "80") ||
        (scheme == "https" && port == "443") || port.isEmpty
      if (dflt) auth = auth.substring(0, colon)
    }
    val pathAndQuery = rest.substring(authEnd)
    val qmark = pathAndQuery.indexOf('?')
    val rawPath = if (qmark < 0) pathAndQuery
      else pathAndQuery.substring(0, qmark)
    val rawQuery = if (qmark < 0) "" else pathAndQuery.substring(qmark + 1)
    val path = {
      val p = removeDots(normPercent(rawPath))
      if (p.isEmpty) "/" else p
    }
    val query = rawQuery.split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) (normPercent(kv), "")
        else (normPercent(kv.substring(0, eq)),
          normPercent(kv.substring(eq + 1)))
      }
      .filterNot { case (k, _) => isTracking(k.toLowerCase) }
      .sorted
      .map { case (k, v) => if (v.isEmpty) k else s"$k=$v" }
      .mkString("&")
    scheme + "://" + auth + path + (if (query.isEmpty) "" else "?" + query)
  }

  /** Registrable domain of a canonical URL or bare host: the one
    * label above the public suffix, cut by [[PublicSuffixList]] rules
    * (plain, wildcard, exception — the published format). The default
    * [[PublicSuffixList.embedded]] subset keeps the engine
    * self-contained; a deployment passes
    * `PublicSuffixList.fromFile(...)` of the full published snapshot
    * for exact cuts on the long tail (`*.co.za`, `*.com.tr`, ...).
    */
  def registrableDomain(hostOrUrl: String,
      psl: PublicSuffixList = PublicSuffixList.embedded): String = {
    if (hostOrUrl == null) return null
    var h = hostOrUrl
    val se = h.indexOf("://")
    if (se > 0) {
      h = h.substring(se + 3)
      val end = h.indexWhere(c => c == '/' || c == '?' || c == '#')
      if (end >= 0) h = h.substring(0, end)
    }
    h = h.toLowerCase
    val colon = h.lastIndexOf(':')
    if (colon >= 0 && h.drop(colon + 1).forall(_.isDigit))
      h = h.substring(0, colon)
    if (h.isEmpty || h.forall(c => c.isDigit || c == '.')) return h // IP
    psl.registrable(h)
  }

  def urlCanonical(url: Column): Column = {
    val f = udf { s: String => Option(canonicalize(s)) }
    f(url)
  }

  def urlDomain(url: Column,
      psl: PublicSuffixList = PublicSuffixList.embedded): Column = {
    val f = udf { s: String => Option(registrableDomain(s, psl)) }
    f(url)
  }
}
