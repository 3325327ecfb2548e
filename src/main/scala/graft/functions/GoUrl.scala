package graft.functions

/** Go `net/url`-compatible URL parsing, reference resolution and
  * re-serialization.
  *
  * The reference engine identifies a Url by the *string produced by Go's*
  * `url.Parse(href).String()` resolved against the source page
  * (/root/reference/vendor/github.com/datatogether/core/url.go:461-477), so
  * link extraction is byte-for-byte sensitive to Go's parser quirks:
  * lower-cased scheme, opaque (non-hierarchical) URLs like `mailto:`,
  * RFC 3986 merge + dot-segment removal, and Go's path re-escaping table.
  * This is a from-scratch Scala implementation of those published semantics
  * (RFC 3986 + the Go standard library's documented behavior), not a
  * translation of Go source text.
  *
  * One deliberate deviation, applied by callers at href-resolution time (see
  * [[LinkExtract.resolveHref]]): backslashes in href values are folded to
  * forward slashes (WHATWG URL spec behavior) so `\\reddit.com` resolves to
  * `http://reddit.com`, matching the reference's own golden expectation
  * (/root/reference/crawler_test.go:41).
  */
final case class GoUrl(
    scheme: String = "",
    opaque: String = "",
    user: String = null, // userinfo without trailing '@'; null = absent
    host: String = "",   // includes port, e.g. "127.0.0.1:8002"
    path: String = "",   // decoded path
    rawPath: String = "", // original escaped path iff it differs from canonical
    forceQuery: Boolean = false,
    rawQuery: String = "",
    fragment: String = ""
) {

  def hostname: String = {
    val h = host
    if (h.startsWith("[")) { // [ipv6]:port
      val i = h.indexOf(']')
      if (i >= 0) h.substring(1, i) else h
    } else {
      val i = h.lastIndexOf(':')
      if (i >= 0) h.substring(0, i) else h
    }
  }

  def port: String = {
    val h = host
    val i = h.lastIndexOf(':')
    if (i >= 0 && h.indexOf(']').max(-1) < i) h.substring(i + 1) else ""
  }

  /** Go URL.EscapedPath: prefer rawPath when it round-trips, else re-escape. */
  def escapedPath: String = {
    if (rawPath.nonEmpty && GoUrl.validEncoded(rawPath, GoUrl.EncodePath)) {
      GoUrl.unescape(rawPath, GoUrl.EncodePath) match {
        case Right(p) if p == path => return rawPath
        case _                     => ()
      }
    }
    GoUrl.escape(path, GoUrl.EncodePath)
  }

  /** Go URL.String re-serialization. */
  def serialize: String = {
    val buf = new StringBuilder
    if (scheme.nonEmpty) { buf.append(scheme).append(':') }
    if (opaque.nonEmpty) buf.append(opaque)
    else {
      if (scheme.nonEmpty || host.nonEmpty || user != null) {
        if (host.nonEmpty || path.nonEmpty || user != null) buf.append("//")
        if (user != null) buf.append(user).append('@')
        if (host.nonEmpty) buf.append(GoUrl.escape(host, GoUrl.EncodeHost))
      }
      val p = escapedPath
      if (p.nonEmpty && p.charAt(0) != '/' && host.nonEmpty) buf.append('/')
      if (buf.isEmpty) {
        // relative path with ':' in first segment needs "./" disambiguation
        val seg = p.takeWhile(_ != '/')
        if (seg.contains(':')) buf.append("./")
      }
      buf.append(p)
    }
    if (forceQuery || rawQuery.nonEmpty) buf.append('?').append(rawQuery)
    if (fragment.nonEmpty)
      buf.append('#').append(GoUrl.escape(fragment, GoUrl.EncodeFragment))
    buf.toString
  }

  def isAbs: Boolean = scheme.nonEmpty

  /** RFC 3986 §5.3 reference resolution, Go URL.ResolveReference semantics. */
  def resolveReference(ref: GoUrl): GoUrl = {
    if (ref.scheme.nonEmpty || ref.host.nonEmpty || ref.user != null) {
      val abs = if (ref.scheme.isEmpty) ref.copy(scheme = scheme) else ref
      val merged = GoUrl.resolvePath(abs.escapedPath, "")
      GoUrl.setPath(abs, merged)
    } else if (ref.opaque.nonEmpty) {
      ref.copy(scheme = scheme, user = null, host = "", path = "", rawPath = "")
    } else {
      var out = ref.copy(scheme = scheme, host = host, user = user)
      if (ref.path.isEmpty && !ref.forceQuery && ref.rawQuery.isEmpty) {
        out = out.copy(rawQuery = rawQuery)
        if (ref.fragment.isEmpty) out = out.copy(fragment = fragment)
      }
      GoUrl.setPath(out, GoUrl.resolvePath(escapedPath, ref.escapedPath))
    }
  }
}

object GoUrl {

  sealed trait Encoding
  case object EncodePath extends Encoding
  case object EncodeHost extends Encoding
  case object EncodeQuery extends Encoding
  case object EncodeFragment extends Encoding

  /** Go net/url shouldEscape for the modes we serialize with. */
  private def shouldEscape(c: Char, mode: Encoding): Boolean = {
    if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9'))
      return false
    if (mode == EncodeHost) {
      // Go: §3.2.2 Host allows sub-delims plus [:]<>"
      c match {
        case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
            ':' | '[' | ']' | '<' | '>' | '"' =>
          return false
        case _ => ()
      }
    }
    c match {
      case '-' | '_' | '.' | '~' => false
      case '$' | '&' | '+' | ',' | '/' | ':' | ';' | '=' | '?' | '@' =>
        mode match {
          case EncodePath     => c == '?'
          case EncodeQuery    => true
          case EncodeFragment => false
          case EncodeHost     => true
        }
      case _ => true
    }
  }

  private val upperhex = "0123456789ABCDEF"

  def escape(s: String, mode: Encoding): String = {
    // fast path: most real paths/hosts need no escaping at all — one scan,
    // zero allocation, identical output (an ASCII char that needs no escape
    // passes through verbatim)
    var k = 0
    while (k < s.length && s.charAt(k) < 0x80 && !shouldEscape(s.charAt(k), mode))
      k += 1
    if (k == s.length) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val buf = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val c = (b & 0xff).toChar
      if (c < 0x80 && !shouldEscape(c, mode)) buf.append(c)
      else {
        buf.append('%')
        buf.append(upperhex((b & 0xff) >> 4))
        buf.append(upperhex(b & 0x0f))
      }
      i += 1
    }
    buf.toString
  }

  private def ishex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def unhex(c: Char): Int =
    if (c <= '9') c - '0' else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10

  /** Go net/url validEncoded: may rawPath serve as the escaped path? */
  def validEncoded(s: String, mode: Encoding): Boolean = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '!' | '$' | '&' | '\'' | '(' | ')' | '*' | '+' | ',' | ';' | '=' |
            ':' | '@' | '[' | ']' | '%' => ()
        case c =>
          if (c >= 0x80 || shouldEscape(c, mode)) return false
      }
      i += 1
    }
    true
  }

  /** Percent-decode; Left(err) on invalid escape (Go: "invalid URL escape"). */
  def unescape(s: String, mode: Encoding): Either[String, String] = {
    if (!s.contains('%')) return Right(s)
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length || !ishex(s.charAt(i + 1)) || !ishex(s.charAt(i + 2)))
          return Left(s"invalid URL escape \"${s.substring(i, math.min(i + 3, s.length))}\"")
        out.write(unhex(s.charAt(i + 1)) * 16 + unhex(s.charAt(i + 2)))
        i += 3
      } else {
        // multi-byte chars: write UTF-8 bytes
        val bs = c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    Right(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Go setPath: decode escaped path into (path, rawPath). */
  def setPath(u: GoUrl, escaped: String): GoUrl =
    unescape(escaped, EncodePath) match {
      case Right(p) =>
        val raw = if (escape(p, EncodePath) == escaped) "" else escaped
        u.copy(path = p, rawPath = raw)
      case Left(_) => u.copy(path = escaped, rawPath = "") // unreachable via resolvePath
    }

  /** Go resolvePath: merge + remove dot segments; always rooted. */
  def resolvePath(base: String, ref: String): String = {
    val full =
      if (ref.isEmpty) base
      else if (ref.charAt(0) != '/') {
        val i = base.lastIndexOf('/')
        base.substring(0, i + 1) + ref
      } else ref
    if (full.isEmpty) return ""
    // fast path: a dot segment needs '.' at a segment start, i.e. at
    // position 0 or right after a '/'. Without one, the answer is just the
    // rooted merged path — no split/buffer/join allocations (identical
    // output; link resolution runs this tens of millions of times per wave)
    if (full.charAt(0) != '.' && full.indexOf("/.") < 0)
      return if (full.charAt(0) == '/') full else "/" + full
    val src = full.split("/", -1)
    val dst = scala.collection.mutable.ArrayBuffer.empty[String]
    src.foreach {
      case "."  => ()
      case ".." => if (dst.nonEmpty) dst.remove(dst.length - 1)
      case e    => dst += e
    }
    val last = src.last
    if (last == "." || last == "..") dst += ""
    "/" + dst.mkString("/").stripPrefix("/")
  }

  private def containsCtl(s: String): Boolean = s.exists(c => c < 0x20 || c == 0x7f)

  /** Go getScheme. Returns (scheme, rest) or error. */
  private def getScheme(raw: String): Either[String, (String, String)] = {
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) { /* ok */ }
      else if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
        if (i == 0) return Right(("", raw))
      } else if (c == ':') {
        if (i == 0) return Left("missing protocol scheme")
        return Right((raw.substring(0, i), raw.substring(i + 1)))
      } else {
        return Right(("", raw))
      }
      i += 1
    }
    Right(("", raw))
  }

  private def parseAuthority(authority: String): Either[String, (String, String)] = {
    val at = authority.lastIndexOf('@')
    val (userinfo, hostPart) =
      if (at < 0) (null: String, authority)
      else (authority.substring(0, at), authority.substring(at + 1))
    // Go validates host bytes; we accept and keep verbatim (lenient), but
    // reject control characters.
    if (containsCtl(hostPart)) Left("invalid character in host name")
    else {
      val h = unescape(hostPart, EncodeHost) match {
        case Right(x) => x
        case Left(e)  => return Left(e)
      }
      Right((userinfo, h))
    }
  }

  /** Go url.Parse (viaRequest=false). */
  def parse(rawUrl: String): Either[String, GoUrl] = {
    if (containsCtl(rawUrl))
      return Left("net/url: invalid control character in URL")
    // split off fragment first
    val hash = rawUrl.indexOf('#')
    val (beforeFrag, frag) =
      if (hash < 0) (rawUrl, "") else (rawUrl.substring(0, hash), rawUrl.substring(hash + 1))
    val fragDecoded =
      if (frag.isEmpty) ""
      else unescape(frag, EncodeFragment) match {
        case Right(f) => f
        case Left(e)  => return Left(e)
      }

    if (beforeFrag == "*") return Right(GoUrl(path = "*", fragment = fragDecoded))

    val (scheme, rest0) = getScheme(beforeFrag) match {
      case Right(sr) => sr
      case Left(e)   => return Left(e)
    }
    val schemeLower = scheme.toLowerCase(java.util.Locale.ROOT)

    var rest = rest0
    var forceQuery = false
    var rawQuery = ""
    if (rest.endsWith("?") && !rest.dropRight(1).contains('?')) {
      forceQuery = true
      rest = rest.dropRight(1)
    } else {
      val qi = rest.indexOf('?')
      if (qi >= 0) { rawQuery = rest.substring(qi + 1); rest = rest.substring(0, qi) }
    }

    if (!rest.startsWith("/")) {
      if (schemeLower.nonEmpty) {
        // opaque URL (mailto:user@host)
        return Right(
          GoUrl(scheme = schemeLower, opaque = rest, forceQuery = forceQuery,
            rawQuery = rawQuery, fragment = fragDecoded))
      }
      val ci = rest.indexOf(':')
      if (ci > -1 && !rest.substring(0, ci).contains('/'))
        return Left("first path segment in URL cannot contain colon")
    }

    var user: String = null
    var host = ""
    if ((schemeLower.nonEmpty || !rest.startsWith("///")) && rest.startsWith("//")) {
      val after = rest.substring(2)
      val slash = after.indexOf('/')
      val (authority, tail) =
        if (slash < 0) (after, "") else (after.substring(0, slash), after.substring(slash))
      parseAuthority(authority) match {
        case Right((u0, h0)) => user = u0; host = h0
        case Left(e)         => return Left(e)
      }
      rest = tail
    }

    val base = GoUrl(scheme = schemeLower, user = user, host = host,
      forceQuery = forceQuery, rawQuery = rawQuery, fragment = fragDecoded)
    unescape(rest, EncodePath) match {
      case Right(p) =>
        val raw = if (escape(p, EncodePath) == rest) "" else rest
        Right(base.copy(path = p, rawPath = raw))
      case Left(e) => Left(e)
    }
  }

  /** core/url.go:305-314 isFetchable: "" | http | https schemes only. */
  def isFetchable(rawUrl: String): Boolean =
    parse(rawUrl) match {
      case Right(u) => u.scheme.isEmpty || u.scheme == "http" || u.scheme == "https"
      case Left(_)  => false
    }

  /** Host (with port) of a raw url string, or "" if unparseable. */
  def hostOf(rawUrl: String): String =
    parse(rawUrl).map(_.host).getOrElse("")

  /** Go filepath.Base semantics (ffi.go:37-43 FilenameFromUrlString). */
  def filepathBase(p: String): String = {
    if (p.isEmpty) return "."
    var s = p
    while (s.nonEmpty && s.endsWith("/")) s = s.dropRight(1)
    if (s.isEmpty) return "/"
    val i = s.lastIndexOf('/')
    if (i >= 0) s = s.substring(i + 1)
    if (s.isEmpty) "/" else s
  }

  /** Go filepath.Ext: suffix from the final dot in the last element. */
  def filepathExt(p: String): String = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) != '/') {
      if (p.charAt(i) == '.') return p.substring(i)
      i -= 1
    }
    ""
  }

  /** ffi.FilenameFromUrlString (ffi.go:37-43): Base(u.Path), None on parse error. */
  def filenameFromUrl(rawUrl: String): Option[String] =
    parse(rawUrl).toOption.map(u => filepathBase(u.path))
}
