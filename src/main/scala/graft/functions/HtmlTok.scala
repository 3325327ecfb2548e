package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal HTML5 tokenizer for link/title extraction.
  *
  * The reference extracts links by selecting every element with an `href`
  * attribute in document order (goquery `doc.Find("[href]")`,
  * /root/reference/vendor/github.com/datatogether/core/url.go:466-508) and the
  * page title via `doc.Find("title").Text()` (core/url.go:188-195). This is a
  * from-scratch tokenizer implementing the WHATWG HTML tokenization states we
  * need: tags with quoted/unquoted attributes, comments (incl. conditional
  * comments), doctype, RAWTEXT (script/style) and RCDATA (title/textarea)
  * content, and character-reference decoding in attribute values and RCDATA.
  *
  * Correctness-critical behaviors pinned by the reference's fixture site
  * (/root/reference/static/index.html, crawler_test.go:27-44):
  *  - urls inside attribute *values* (meta content="...<a href=...>") are NOT
  *    elements and must not be extracted;
  *  - entity-escaped markup (&lt;a href=...&gt;) is text, not an element;
  *  - <link href> counts, <img src>/<script src> do not (only `href`);
  *  - markup inside <!--[if lt IE 9]> ... <![endif]--> is comment content.
  */
object HtmlTok {

  final case class Tag(name: String, attrs: List[(String, String)], closing: Boolean)

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "trade" -> "™", "deg" -> "°",
    "plusmn" -> "±", "frac12" -> "½", "times" -> "×",
    "divide" -> "÷", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "sect" -> "§",
    "para" -> "¶", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "iquest" -> "¿", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "eacute" -> "é",
    "egrave" -> "è", "ccedil" -> "ç", "ntilde" -> "ñ",
    "ouml" -> "ö", "uuml" -> "ü", "auml" -> "ä")

  /** Decode HTML character references (named subset + numeric). */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 32) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            } else namedEntities.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** ASCII-case-insensitive indexOf (needle must be lowercase ASCII). */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val hn = hay.length; val nn = needle.length
    var i = from
    while (i + nn <= hn) {
      var j = 0
      while (j < nn && asciiLower(hay.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == nn) return i
      i += 1
    }
    -1
  }

  /** Tokenize html into tags + RCDATA text callbacks.
    * onTag fires per tag in document order; onRcdataText fires with the
    * decoded text content of title elements.
    */
  def tokenize(html: String, onTag: Tag => Unit, onTitleText: String => Unit): Unit = {
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return
      i = lt
      if (i + 1 >= n) return
      val c1 = html.charAt(i + 1)
      if (c1 == '!') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else { // doctype / bogus
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        }
      } else if (c1 == '?') { // bogus comment (processing instruction)
        val end = html.indexOf('>', i)
        i = if (end < 0) n else end + 1
      } else if (c1 == '/' || isLetter(c1)) {
        val closing = c1 == '/'
        var j = if (closing) i + 2 else i + 1
        val nameStart = j
        while (j < n && !isSpace(html.charAt(j)) && html.charAt(j) != '>' && html.charAt(j) != '/')
          j += 1
        val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        if (name.isEmpty) { i += 1 }
        else {
          val attrs = ArrayBuffer.empty[(String, String)]
          // first-wins dedup by linear scan: tags carry a handful of attrs,
          // and the per-tag HashSet was allocator noise on the wave kernel's
          // ~45 tags/page hot path (same semantics as the old seen-set)
          def unseen(a: String): Boolean = {
            var x = 0
            while (x < attrs.length) {
              if (attrs(x)._1 == a) return false
              x += 1
            }
            true
          }
          var done = false
          while (!done && j < n) {
            while (j < n && (isSpace(html.charAt(j)) || html.charAt(j) == '/')) j += 1
            if (j >= n) done = true
            else if (html.charAt(j) == '>') { j += 1; done = true }
            else {
              // attribute name
              val as = j
              while (j < n && !isSpace(html.charAt(j)) && html.charAt(j) != '=' &&
                     html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              val aname = html.substring(as, j).toLowerCase(java.util.Locale.ROOT)
              while (j < n && isSpace(html.charAt(j))) j += 1
              var avalue = ""
              if (j < n && html.charAt(j) == '=') {
                j += 1
                while (j < n && isSpace(html.charAt(j))) j += 1
                if (j < n) {
                  val q = html.charAt(j)
                  if (q == '"' || q == '\'') {
                    j += 1
                    val vs = j
                    while (j < n && html.charAt(j) != q) j += 1
                    avalue = html.substring(vs, math.min(j, n))
                    if (j < n) j += 1
                  } else {
                    val vs = j
                    while (j < n && !isSpace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                    avalue = html.substring(vs, j)
                  }
                }
              }
              if (aname.nonEmpty && unseen(aname))
                attrs += (aname -> decodeEntities(avalue))
            }
          }
          i = j
          onTag(Tag(name, attrs.toList, closing))
          if (!closing) {
            // RAWTEXT / RCDATA content handling
            if (name == "script" || name == "style") {
              val end = indexOfIgnoreCase(html, "</" + name, i)
              i = if (end < 0) n else end
            } else if (name == "title" || name == "textarea") {
              val end = indexOfIgnoreCase(html, "</" + name, i)
              val stop = if (end < 0) n else end
              if (name == "title") onTitleText(decodeEntities(html.substring(i, stop)))
              i = stop
            }
          }
        }
      } else {
        i += 1 // stray '<' is text
      }
    }
  }

  /** All href attribute values in document order (goquery Find("[href]")). */
  def extractHrefs(html: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    tokenize(html, tag => {
      if (!tag.closing) tag.attrs.find(_._1 == "href").foreach(out += _._2)
    }, _ => ())
    out.toSeq
  }

  /** Concatenated text of all <title> elements (goquery Find("title").Text()). */
  def extractTitle(html: String): String = {
    val sb = new StringBuilder
    tokenize(html, _ => (), t => sb.append(t))
    sb.toString
  }

  /** Visible text of a document (goquery doc.Text() shape): all text nodes
    * in document order with entities decoded; script/style/comment content
    * excluded; whitespace runs collapsed to single spaces and trimmed. */
  def extractText(html: String): String = {
    val out = new StringBuilder
    var pendingSpace = false
    def emit(from: Int, to: Int): Unit = {
      if (to > from) {
        val seg = decodeEntities(html.substring(from, to))
        var j = 0
        while (j < seg.length) {
          val c = seg.charAt(j)
          if (Character.isWhitespace(c)) pendingSpace = out.nonEmpty
          else {
            if (pendingSpace) { out.append(' '); pendingSpace = false }
            out.append(c)
          }
          j += 1
        }
      }
    }
    val n = html.length
    var textStart = 0
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emit(textStart, n); return out.toString }
      tokenizeOne(html, lt) match {
        case Some(p) => // markup: flush preceding text, skip construct
          emit(textStart, lt)
          pendingSpace = out.nonEmpty // tag boundaries separate text nodes
          i = p
          textStart = p
        case None => // stray '<' is text; keep scanning
          i = lt + 1
      }
    }
    emit(textStart, n)
    out.toString
  }

  /** (href, anchor text) pairs in document order — link CONTEXT, not just
    * targets: anchor text is the classic relevance/label signal a link
    * graph carries for ranking and for query-document training pairs.
    * Semantics: an anchor with no href contributes nothing; a new `<a>`
    * implicitly closes an open one (HTML5 forbids nesting); text is
    * entity-decoded and whitespace-collapsed exactly like [[extractText]];
    * markup inside the anchor (`<b>`, comments, script bodies) separates
    * but never contributes text. */
  def extractAnchors(html: String): Seq[(String, String)] = {
    val out = ArrayBuffer.empty[(String, String)]
    val n = html.length
    var href: String = null
    val text = new StringBuilder
    var pendingSpace = false
    def emit(from: Int, to: Int): Unit = {
      if (href != null && to > from) {
        val seg = decodeEntities(html.substring(from, to))
        var j = 0
        while (j < seg.length) {
          val c = seg.charAt(j)
          if (Character.isWhitespace(c)) pendingSpace = text.nonEmpty
          else {
            if (pendingSpace) { text.append(' '); pendingSpace = false }
            text.append(c)
          }
          j += 1
        }
      }
    }
    def close(): Unit = if (href != null) {
      out += href -> text.toString
      href = null; text.setLength(0); pendingSpace = false
    }
    var i = 0
    var textStart = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emit(textStart, n); close(); return out.toSeq }
      tokenizeOne(html, lt) match {
        case Some(p) =>
          emit(textStart, lt)
          pendingSpace = text.nonEmpty
          val c1 = if (lt + 1 < n) html.charAt(lt + 1) else ' '
          if (c1 == '/' || isLetter(c1)) {
            val closing = c1 == '/'
            var j = if (closing) lt + 2 else lt + 1
            val ns = j
            while (j < n && !isSpace(html.charAt(j)) && html.charAt(j) != '>' &&
                   html.charAt(j) != '/') j += 1
            if (html.substring(ns, j).toLowerCase(java.util.Locale.ROOT) == "a") {
              close() // </a>, or implicit close by a new <a>
              if (!closing) href = findHref(html, j, p).orNull
            }
          }
          i = p
          textStart = p
        case None => i = lt + 1
      }
    }
    emit(textStart, n)
    close()
    out.toSeq
  }

  /** href attribute value inside one tag's attribute region [from, limit). */
  private def findHref(html: String, from: Int, limit: Int): Option[String] = {
    var j = from
    while (j < limit) {
      while (j < limit && (isSpace(html.charAt(j)) || html.charAt(j) == '/')) j += 1
      if (j >= limit || html.charAt(j) == '>') return None
      val as = j
      while (j < limit && !isSpace(html.charAt(j)) && html.charAt(j) != '=' &&
             html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
      val aname = html.substring(as, j).toLowerCase(java.util.Locale.ROOT)
      while (j < limit && isSpace(html.charAt(j))) j += 1
      var avalue = ""
      if (j < limit && html.charAt(j) == '=') {
        j += 1
        while (j < limit && isSpace(html.charAt(j))) j += 1
        if (j < limit) {
          val q = html.charAt(j)
          if (q == '"' || q == '\'') {
            j += 1
            val vs = j
            while (j < limit && html.charAt(j) != q) j += 1
            avalue = html.substring(vs, math.min(j, limit))
            if (j < limit) j += 1
          } else {
            val vs = j
            while (j < limit && !isSpace(html.charAt(j)) && html.charAt(j) != '>') j += 1
            avalue = html.substring(vs, j)
          }
        }
      }
      if (aname == "href") return Some(decodeEntities(avalue))
      if (aname.isEmpty) j += 1
    }
    None
  }

  /** Consume exactly one markup construct starting at `pos` ('<'); returns
    * the position after it (after RAWTEXT content for script/style), or
    * None if it is not markup. */
  private def tokenizeOne(html: String, pos: Int): Option[Int] = {
    val n = html.length
    if (pos + 1 >= n) return Some(n)
    val c1 = html.charAt(pos + 1)
    if (c1 == '!') {
      if (html.startsWith("<!--", pos)) {
        val end = html.indexOf("-->", pos + 4)
        Some(if (end < 0) n else end + 3)
      } else {
        val end = html.indexOf('>', pos)
        Some(if (end < 0) n else end + 1)
      }
    } else if (c1 == '?') {
      val end = html.indexOf('>', pos)
      Some(if (end < 0) n else end + 1)
    } else if (c1 == '/' || isLetter(c1)) {
      var j = if (c1 == '/') pos + 2 else pos + 1
      val nameStart = j
      while (j < n && !isSpace(html.charAt(j)) && html.charAt(j) != '>' && html.charAt(j) != '/')
        j += 1
      val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
      // scan to tag end respecting quoted attribute values
      var done = false
      while (!done && j < n) {
        val c = html.charAt(j)
        if (c == '>') { j += 1; done = true }
        else if (c == '"' || c == '\'') {
          val q = c; j += 1
          while (j < n && html.charAt(j) != q) j += 1
          if (j < n) j += 1
        } else j += 1
      }
      if (c1 != '/' && (name == "script" || name == "style")) {
        val end = indexOfIgnoreCase(html, "</" + name, j)
        Some(if (end < 0) n else end)
      } else Some(j)
    } else None
  }

  def bytesToString(body: Array[Byte]): String =
    if (body == null) "" else new String(body, java.nio.charset.StandardCharsets.UTF_8)
}
