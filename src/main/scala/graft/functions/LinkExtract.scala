package graft.functions

/** Link extraction: href values resolved against the page url.
  *
  * Mirrors ExtractDocLinks (/root/reference/vendor/github.com/datatogether/
  * core/url.go:460-511): every `[href]` element in document order, each value
  * parsed and resolved against the page's url; unparseable hrefs are silently
  * skipped (url.go:473-475). The stored url string is the resolved URL's
  * re-serialization — verbatim, NOT normalized (SURVEY §1.3).
  */
object LinkExtract {

  /** Fold backslashes to forward slashes before parsing (WHATWG URL spec
    * behavior) so `\\host` reads as scheme-relative — pinned by the
    * reference's own golden expectation that `\\reddit.com` on the fixture
    * page is stored as `http://reddit.com` (crawler_test.go:41). */
  private def foldBackslashes(href: String): String =
    if (href.indexOf('\\') >= 0) href.replace('\\', '/') else href

  /** Resolve one href against a base page url. None = skip (parse failure). */
  def resolveHref(baseUrl: String, href: String): Option[String] =
    for {
      base <- GoUrl.parse(baseUrl).toOption
      ref  <- GoUrl.parse(foldBackslashes(href)).toOption
    } yield base.resolveReference(ref).serialize

  /** All resolved outbound link destinations of a page, document order,
    * duplicates preserved (the reference's per-row Read-or-Insert collapses
    * them; set semantics are applied at the link-table write). The base url
    * is parsed ONCE per page, not once per href (identical results —
    * resolveHref re-parsed the same base string for every link, which on
    * the wave kernel's ~16-link pages was 16x redundant parse work). */
  def extractLinks(pageUrl: String, html: String): Seq[String] =
    GoUrl.parse(pageUrl).toOption match {
      case None => Seq.empty
      case Some(base) =>
        HtmlTok.extractHrefs(html).flatMap(h =>
          GoUrl.parse(foldBackslashes(h)).toOption
            .map(ref => base.resolveReference(ref).serialize))
    }

  /** Extracted links of a raw body iff it sniffs as html/plain utf-8
    * (core/url.go:188-195 gate), else empty. */
  def extractLinksFromBody(pageUrl: String, body: Array[Byte]): Seq[String] = {
    val sniff = Sniff.detectContentType(body)
    if (sniff == "text/html; charset=utf-8" || sniff == "text/plain; charset=utf-8")
      extractLinks(pageUrl, HtmlTok.bytesToString(body))
    else Seq.empty
  }

  def titleFromBody(body: Array[Byte]): String = {
    val sniff = Sniff.detectContentType(body)
    if (sniff == "text/html; charset=utf-8" || sniff == "text/plain; charset=utf-8")
      HtmlTok.extractTitle(HtmlTok.bytesToString(body))
    else ""
  }
}
