package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-level corpus filters — the first gate a crawl-derived training
  * corpus passes (spam/adult/malware domain blocklists, curated allowlists).
  *
  * Matching semantics: an entry blocks its domain AND every subdomain
  * ("example.com" blocks "ads.example.com" but never "notexample.com"), the
  * hosts-file convention every published blocklist assumes. A url is
  * blocked iff ANY dot-suffix of its lowercased host is listed.
  */
object UrlFilters {

  /** Host extracted with built-ins (no UDF): text after "://" up to the
    * first "/", port and userinfo stripped, lowercased. */
  def hostCol(url: Column): Column = {
    val auth = substring_index(substring_index(url, "://", -1), "/", 1)
    lower(substring_index(substring_index(auth, "@", -1), ":", 1))
  }

  /** All dot-suffixes of a hostname as an array column:
    * "a.b.example.com" -> ["a.b.example.com", "b.example.com",
    * "example.com", "com"]. Built-ins only — codegen'd. */
  def hostSuffixesCol(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(0), size(parts) - 1),
      i => array_join(slice(parts, i + 1, size(parts) - i), "."))
  }

  private def hostSuffixes(host: String): Iterator[String] =
    Iterator.single(host) ++
      Iterator.iterate(host.indexOf('.'))(i => host.indexOf('.', i + 1))
        .takeWhile(_ >= 0).map(i => host.substring(i + 1))

  /** Drop every url whose host (or any parent domain of it) is listed.
    *
    * Scale shape: the blocklist collects to a driver Set and BROADCASTS
    * once (10^6 domains ≈ tens of MB — broadcast-sized by construction;
    * published blocklists are curated, never corpus-scale), and the corpus
    * pass is a pure map — a per-row hash-set probe over ≤ label-count
    * suffixes, no explode, no join, no shuffle. The set probe is a
    * deliberate UDF kernel: the declarative alternatives either shuffle
    * the corpus (explode + mark + re-group per url) or scan the whole list
    * per row (broadcast nested-loop anti join on array_contains). */
  def blocklistFilter(spark: SparkSession, urls: DataFrame,
      blocklist: DataFrame, urlCol: String = "url",
      domainCol: String = "domain"): DataFrame = {
    val domains = blocklist.select(col(domainCol).cast("string"))
      .na.drop().collect().map(_.getString(0).toLowerCase).toSet
    val bc = spark.sparkContext.broadcast(domains)
    val blockedUdf = udf { (host: String) =>
      host != null && hostSuffixes(host).exists(bc.value.contains)
    }
    urls.filter(!blockedUdf(hostCol(col(urlCol))))
  }

  /** The complement: keep ONLY urls under listed domains (allowlist). */
  def allowlistFilter(spark: SparkSession, urls: DataFrame,
      allowlist: DataFrame, urlCol: String = "url",
      domainCol: String = "domain"): DataFrame = {
    val domains = allowlist.select(col(domainCol).cast("string"))
      .na.drop().collect().map(_.getString(0).toLowerCase).toSet
    val bc = spark.sparkContext.broadcast(domains)
    val allowedUdf = udf { (host: String) =>
      host != null && hostSuffixes(host).exists(bc.value.contains)
    }
    urls.filter(allowedUdf(hostCol(col(urlCol))))
  }
}
