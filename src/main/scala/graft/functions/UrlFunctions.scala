package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (RFC 3986 §6 syntax-based normalization) — the
  * step between link extraction (x93) and URL-keyed dedup/frequency
  * work: a crawl sees the same page as `HTTP://Example.COM:80/a/../b`,
  * `http://example.com/b` and `http://example.com/%62` unless URLs are
  * normalized BEFORE they become join/group keys. At 100 TB the key
  * cardinality (and therefore every URL-keyed shuffle) is directly
  * inflated by unnormalized aliases.
  *
  * Rules (each from RFC 3986 §6.2.2-6.2.3, deterministic, spec-pinned):
  *   - scheme and host lowercase; userinfo kept verbatim;
  *   - default port dropped (http:80, https:443), other ports kept;
  *   - percent-encoding: unreserved octets (ALPHA / DIGIT / - . _ ~)
  *     DECODED; every other escape kept with UPPERCASE hex; a malformed
  *     escape (non-hex, truncated) is left verbatim (WHATWG error
  *     recovery, never a throw);
  *   - dot-segment removal on the path (`/a/./b/../c` → `/a/c`; leading
  *     `..` above root is dropped, the RFC remove_dot_segments rule);
  *   - empty path with an authority → `/`;
  *   - query kept verbatim modulo escape normalization (parameter
  *     REORDERING is deliberately not done — it changes semantics for
  *     order-sensitive endpoints; a dedup pipeline that wants it sorts
  *     the key downstream);
  *   - fragment dropped (never sent to the server).
  *
  * Output: struct(norm_url, scheme, host, port int, path) — the pieces
  * a host-level quota/politeness stage groups by, plus the rebuilt
  * canonical key. NULL for null input or a URL with no `scheme://`
  * (relative references have no canonical absolute form). Map-only,
  * one pass per component. (Reference: an options ETL, no URL analog —
  * this extends the web family between x93 and the dedup/quota verbs.)
  */
case class UrlNormalize(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("norm_url", StringType, nullable = false),
    StructField("scheme", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("port", IntegerType, nullable = true),
    StructField("path", StringType, nullable = false)))
  override def nullable: Boolean = true

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  /** §6.2.2.2: decode unreserved escapes, uppercase the rest; malformed
    * escapes verbatim. */
  private def normEscapes(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreserved(v)) b.append(v.toChar)
        else {
          b.append('%')
          b.append(Character.toUpperCase(s.charAt(i + 1)))
          b.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** §5.2.4 remove_dot_segments. Empty segments are REAL segments and
    * are preserved (`/a//b` stays `/a//b` — the RFC does not collapse
    * them); a trailing empty segment IS the trailing slash, and a
    * trailing `.`/`..` leaves the path denoting a directory.
    */
  private def removeDotSegments(path: String): String = {
    val absolute = path.startsWith("/")
    val segs = path.split("/", -1)
    val work = if (absolute) segs.drop(1) else segs
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var endsDir = false
    work.foreach {
      case "." => endsDir = true
      case ".." =>
        endsDir = true
        if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg; endsDir = false
    }
    if (endsDir) out += ""
    (if (absolute) "/" else "") + out.mkString("/")
  }

  override protected def nullSafeEval(urlAny: Any): Any = {
    val raw = urlAny.asInstanceOf[UTF8String].toString
    val ss = raw.indexOf("://")
    if (ss <= 0) return null
    val scheme = raw.substring(0, ss).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => Character.isLetterOrDigit(c) || c == '+' || c == '-' || c == '.'))
      return null
    var rest = raw.substring(ss + 3)
    // fragment dropped first (it may contain any character)
    val frag = rest.indexOf('#')
    if (frag >= 0) rest = rest.substring(0, frag)
    // authority ends at the first '/' or '?'
    var authEnd = rest.length
    var k = 0
    while (k < rest.length && authEnd == rest.length) {
      val c = rest.charAt(k)
      if (c == '/' || c == '?') authEnd = k
      k += 1
    }
    val auth = rest.substring(0, authEnd)
    if (auth.isEmpty) return null
    val afterAuth = rest.substring(authEnd)
    // userinfo@host:port
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostPort = auth.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val (hostRaw, portStr) =
      if (colon >= 0 && hostPort.drop(colon + 1).forall(Character.isDigit) &&
        colon + 1 < hostPort.length)
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    if (hostRaw.isEmpty) return null
    val host = hostRaw.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = scheme match {
      case "http" => 80
      case "https" => 443
      case _ => -1
    }
    val port =
      if (portStr.isEmpty) -1
      else
        try {
          val p = Integer.parseInt(portStr)
          if (p == defaultPort) -1 else p
        } catch { case _: NumberFormatException => return null }
    // path / query split
    val q = afterAuth.indexOf('?')
    val pathRaw = if (q >= 0) afterAuth.substring(0, q) else afterAuth
    val queryRaw = if (q >= 0) afterAuth.substring(q + 1) else null
    val path0 = removeDotSegments(normEscapes(pathRaw))
    val path = if (path0.isEmpty) "/" else path0
    val query = if (queryRaw == null) null else normEscapes(queryRaw)
    val norm = new StringBuilder(raw.length)
    norm.append(scheme).append("://").append(userinfo).append(host)
    if (port >= 0) norm.append(':').append(port)
    norm.append(path)
    if (query != null) norm.append('?').append(query)
    InternalRow(
      UTF8String.fromString(norm.toString),
      UTF8String.fromString(scheme),
      UTF8String.fromString(host),
      if (port >= 0) port else null,
      UTF8String.fromString(path))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
