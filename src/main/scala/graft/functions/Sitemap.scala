package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sitemap-to-seed pipeline: the operational composition the reference
    * runs around its SeedUrlHandler — discovered sitemap `<loc>` urls
    * become seed CANDIDATES only if they (a) carry a fetchable scheme
    * (core/url.go:305-314 — "", http, https; the P2 gate) and (b) fall
    * inside a registered source prefix (the ValidArchivingUrl containment
    * gate of core/urls.go:111-121, the J7 theta shape — the same rule
    * Scheduler.seedUrl enforces, so everything this op emits as eligible
    * is accepted by the seed write path).
    *
    * Input: `sitemaps(xml)` fetched sitemap bodies, `sources(prefix)` the
    * registered ACTIVE source prefixes (pass the live catalog — blank/
    * whitespace prefixes are ignored here, mirroring seedUrl's
    * length-gate, but soft-delete filtering is the caller's job). Output
    * one row per DISTINCT discovered loc — including scheme-rejected locs
    * (ftp:, mailto:, …), which surface with `eligible = false` so a
    * discovered-but-ineligible audit sees the full discovery set:
    * `(loc, pref, eligible)` — pref = the matching source prefix
    * (smallest on multi-match, for determinism; null when none); eligible
    * requires BOTH a fetchable scheme and a prefix match. Matching is
    * case-insensitive, like the write path's gate.
    *
    * Scale shape: locs explode narrow and dedup by value (one shuffle);
    * the source catalog is small by construction (a curated registry) and
    * broadcasts — the theta containment join never shuffles the loc side;
    * scheme gating is a codegen'd prefix test. */
  def seedCandidates(sitemaps: DataFrame, sources: DataFrame): DataFrame = {
    val locs = sitemaps
      .select(explode(sitemapLocsCol(col("xml"))).as("loc")).distinct()
      // the scheme test lives in the ELIGIBILITY expression, not a filter:
      // scheme-rejected locs must still surface (eligible=false) so the
      // output is truly one row per distinct discovered loc
      .withColumn("_scheme_ok", col("loc").startsWith("http://") ||
        col("loc").startsWith("https://"))
    // literal containment (strings.Contains semantics) — LIKE would treat
    // '_'/'%' inside a registered prefix as wildcards; case-insensitive
    // and blank-guarded to match seedUrl's acceptance rule exactly
    locs.join(broadcast(sources.select(col("prefix"))
          .filter(length(trim(col("prefix"))) > 0)),
        expr("contains(lower(loc), lower(prefix))"), "left")
      .groupBy("loc", "_scheme_ok")
      .agg(min(col("prefix")).as("pref"))
      .select(col("loc"), col("pref"),
        (col("_scheme_ok") && col("pref").isNotNull).as("eligible"))
  }
}
