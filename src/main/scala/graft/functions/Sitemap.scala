package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap discovery — the crawl-seeding side-channel next to link
  * extraction: robots.txt advertises sitemap urls (`Sitemap:` directives,
  * sitemaps.org protocol), sitemap XML lists page urls in `<loc>` elements,
  * and a `<sitemapindex>` document points at further sitemaps (the
  * recursive fetch lane). All regexp built-ins — codegen'd, RE2-compatible
  * patterns (no backreferences/lookaround), so a 100 TB robots/sitemap
  * corpus scans as one map pass. */
object Sitemap {

  /** `Sitemap:` directive urls from a robots.txt body. Case-insensitive
    * key, one per line, leading whitespace tolerated (the directive is
    * group-independent per sitemaps.org). */
  def robotsSitemapsCol(robotsTxt: Column): Column =
    regexp_extract_all(robotsTxt, lit("(?im)^[ \\t]*sitemap:[ \\t]*(\\S+)"), lit(1))

  /** `<loc>` urls from sitemap / sitemap-index XML, surrounding whitespace
    * trimmed, the five predefined XML entities decoded — sitemaps.org
    * REQUIRES loc values to be entity-escaped, so an `&` in a query string
    * always arrives as `&amp;` and the crawl target is wrong without the
    * decode. `&amp;` is decoded LAST so `&amp;lt;` round-trips to the
    * literal `&lt;` the producer escaped, never a double-decode. */
  def sitemapLocsCol(xml: Column): Column = {
    val raw = regexp_extract_all(xml, lit("(?is)<loc>\\s*(.*?)\\s*</loc>"), lit(1))
    transform(raw, u =>
      replace(replace(replace(replace(replace(u,
        lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")), lit("&apos;"), lit("'")),
        lit("&amp;"), lit("&")))
  }

  /** True when the XML is a sitemap INDEX (its locs are more sitemaps, not
    * pages) — routes the url to the sitemap lane instead of the page lane. */
  def isSitemapIndexCol(xml: Column): Column =
    xml.rlike("(?is)<\\s*sitemapindex[\\s>]")
}
