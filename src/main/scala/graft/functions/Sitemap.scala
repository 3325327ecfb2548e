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
    * trimmed. */
  def sitemapLocsCol(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<loc>\\s*(.*?)\\s*</loc>"), lit(1))

  /** True when the XML is a sitemap INDEX (its locs are more sitemaps, not
    * pages) — routes the url to the sitemap lane instead of the page lane. */
  def isSitemapIndexCol(xml: Column): Column =
    xml.rlike("(?is)<\\s*sitemapindex[\\s>]")
}
