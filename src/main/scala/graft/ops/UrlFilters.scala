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
    * first "/", "?" or "#" (a query or fragment can directly follow the
    * authority with no path slash — "http://h?x" is valid and common),
    * port and userinfo stripped, lowercased. */
  def hostCol(url: Column): Column = {
    val auth = substring_index(substring_index(substring_index(
      substring_index(url, "://", -1), "/", 1), "?", 1), "#", 1)
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

  /** Registrable domain (eTLD+1) under public-suffix-list semantics — the
    * key every per-SITE statistic should group by ("a10 per-domain rollup"
    * on raw hosts counts blog1.example.co.uk and blog2.example.co.uk as
    * different sites; under the PSL both are example.co.uk). The rule list
    * is an INPUT table (publicsuffix.org publishes ~10k rules; tests plant
    * small sets), with the list's full rule grammar:
    *   - plain rule  "co.uk"   — that suffix is public
    *   - wildcard    "*.ck"    — any single label under .ck is public
    *   - exception   "!www.ck" — overrides a wildcard; public suffix is the
    *                             rule minus its leftmost label
    *   - no match            — default "*" rule: the rightmost label
    * Prevailing rule: any matching exception, else the longest match.
    *
    * Scale shape: run over the DISTINCT host catalog (O(hosts), not corpus
    * rows) and broadcast-join the result back to the corpus. Candidate
    * suffixes explode to ≤ label-count narrow rows per host; both rule
    * joins broadcast (the PSL is KBs); the prevailing-rule pick is one
    * per-host max(struct) with map-side combine. All matching is codegen'd
    * string equality — no regex, no UDF.
    *
    * @param hosts    any frame with a host column (pre-lowercased or not)
    * @param rules    one string column `rule` with PSL rule lines
    * @return (host, public_suffix, registrable_domain) per DISTINCT host;
    *         registrable_domain is null when the host IS a public suffix
    */
  def registrableDomain(hosts: DataFrame, rules: DataFrame,
      hostColName: String = "host"): DataFrame = {
    val r = rules.select(lower(trim(col("rule"))).as("raw"))
      .filter(length(col("raw")) > 0)
      .select(col("raw").startsWith("!").as("is_exc"),
        regexp_replace(col("raw"), "^!", "").as("body"))
      .select(col("is_exc"), col("body").startsWith("*.").as("is_wild"),
        col("body"))
      .select(col("is_exc"), col("is_wild"),
        when(col("is_wild"), expr("substring(body, 3)"))
          .otherwise(col("body")).as("match_key"),
        size(split(col("body"), "\\.")).as("rule_labels"))
    val plainRules = r.filter(!col("is_wild"))
    val wildRules = r.filter(col("is_wild"))
      .select(col("match_key"), col("rule_labels"), col("is_exc"))

    val cat = hosts.select(lower(col(hostColName)).as("host")).distinct()
      .withColumn("labels_", split(col("host"), "\\."))
      .withColumn("n_", size(col("labels_")))
    // candidate trailing-label suffixes, narrow (host, cand, labels, parent)
    val cands = cat.select(col("host"), col("labels_"), col("n_"),
        posexplode(transform(sequence(lit(0), col("n_") - 1),
          i => array_join(slice(col("labels_"), i + 1, col("n_") - i), ".")))
          .as(Seq("i_", "cand_")))
      .withColumn("cand_labels_", col("n_") - col("i_"))
      .withColumn("parent_",
        array_join(slice(col("labels_"), col("i_") + 2,
          col("n_") - col("i_") - 1), "."))
    val plainHits = cands
      .join(broadcast(plainRules), col("cand_") === col("match_key"))
    // a wildcard spans exactly rule_labels labels: the candidate's PARENT
    // equals the rule tail and the candidate itself is one label longer
    val wildHits = cands
      .join(broadcast(wildRules), col("parent_") === col("match_key") &&
        col("cand_labels_") === col("rule_labels"))
    val hits = plainHits.select(col("host"), col("is_exc"), col("rule_labels"))
      .unionByName(wildHits.select(col("host"), col("is_exc"), col("rule_labels")))
      // prevailing rule: exception first, then most labels; an exception's
      // public suffix drops the rule's leftmost label
      .groupBy("host")
      .agg(max(struct(col("is_exc").cast("int").as("e"),
        col("rule_labels").as("l"))).as("best"))
      .select(col("host"),
        (col("best.l") - col("best.e")).as("ps_labels"))

    cat.join(hits, Seq("host"), "left")
      .withColumn("ps_", coalesce(col("ps_labels"), lit(1))) // default "*"
      .select(col("host"),
        array_join(slice(col("labels_"), col("n_") - col("ps_") + 1,
          col("ps_")), ".").as("public_suffix"),
        when(col("n_") > col("ps_"),
          array_join(slice(col("labels_"), col("n_") - col("ps_"),
            col("ps_") + 1), "."))
          .otherwise(lit(null).cast("string")).as("registrable_domain"))
  }
}
