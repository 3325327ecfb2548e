package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level crawl hygiene operators: crawl-trap detection, mirror-host
  * detection, and per-host boilerplate (template) stripping.
  *
  * A production crawl's worst waste is structural, not per-page: a single
  * calendar/session-id trap host can absorb millions of fetches of one
  * document, a mirror farm multiplies every byte by its replica count, and
  * site templates (nav bars, footers) repeat on every page of a host. The
  * reference crawler rate-limits per host (fetchbot's per-host queues) but
  * has no corpus-level view; these operators are the batch analyses a
  * 100 TB pipeline runs over the harvested tables to feed back into the
  * frontier policy (trap hosts → de-prioritize, mirrors → crawl one,
  * boilerplate → strip before training).
  *
  * Scale design: everything is a hash-partitioned groupBy on host (or
  * (host, line/content key)) with map-side partial aggregation — hosts are
  * ~10^7-cardinality at web scale, so per-host state is small; nothing is
  * ever all-pairs across hosts (mirror candidates come from banded MinHash
  * like document LSH, never a host × host join).
  */
object HostAnalysis {

  /** Per-host crawl-trap signals over a `(host, url, content_key)` frame,
    * where `content_key` identifies the fetched content (body hash; see
    * crawl/Stats.scala). One shuffle on host; counts and the distinct-key
    * count combine map-side. Ratios are integer micro-units (x/1e6) so the
    * output is bit-comparable across engines — no float division.
    *
    *  - `dup_ratio_micro`: 1e6 * (n_urls - distinct content) / n_urls —
    *    near 1e6 means many URLs serve the same bytes (session ids,
    *    calendar pages, soft-404 templates: the classic trap signature).
    *  - `query_rate_micro`: fraction of urls carrying a query string —
    *    parameter-explosion traps rank high here.
    *  - `is_trap`: dup_ratio >= `minDupRatioMicro` over at least `minUrls`
    *    urls (one-page hosts are trivially "all duplicate").
    */
  def trapSignals(urls: DataFrame, minUrls: Long = 2L,
      minDupRatioMicro: Long = 800000L): DataFrame =
    urls.groupBy("host").agg(
        count(lit(1)).as("n_urls"),
        countDistinct(col("content_key")).as("n_distinct_content"),
        sum(when(instr(col("url"), "?") > 0, 1L).otherwise(0L)).as("n_query_"))
      .select(col("host"), col("n_urls"), col("n_distinct_content"),
        // `div`, not `/`: Spark's Divide promotes to double, and a
        // double-then-truncate can land one off from exact integer
        // division once numerators get large — the oracle (DuckDB `//`)
        // and the bit-comparable contract above are integer division
        expr("(n_urls - n_distinct_content) * 1000000L div n_urls")
          .cast("long").as("dup_ratio_micro"),
        expr("n_query_ * 1000000L div n_urls").cast("long")
          .as("query_rate_micro"))
      .withColumn("is_trap", col("n_urls") >= minUrls &&
        col("dup_ratio_micro") >= minDupRatioMicro)

  /** Mirror-host detection over a `(host, content_key)` frame: hosts whose
    * content-key SETS overlap above `minJaccardMicro` (exact set Jaccard in
    * integer micro-units). The standard mirror/replica-farm collapse before
    * dedup — crawling ten mirrors of one site is 10x wasted fetch budget.
    *
    * Shape (the document-LSH layout lifted to hosts): per-host MinHash
    * signature (`numHashes` seeded xxhash64 minima — map-side-combining
    * min aggregates, one shuffle on host) → banded buckets (`bands` AND-rows
    * each) → hot-bucket cap → candidate host pairs on narrow (band, bucket)
    * rows → EXACT Jaccard verify by joining the content sets back per
    * candidate (intersection count + inclusion-exclusion union). Never a
    * host × host cross; recall for true mirrors (J = 1) is exact because
    * identical sets hash to identical signatures.
    */
  def mirrorHosts(pages: DataFrame, numHashes: Int = 32, bands: Int = 8,
      minJaccardMicro: Long = 900000L, maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPer = numHashes / bands
    // localCheckpoint: `sets` feeds the signatures, both exact-verify joins,
    // and the size counts — without materializing it, Spark re-runs the
    // full pages scan + distinct shuffle once per consumer (4x the dominant
    // I/O at corpus scale); eager so the cost is paid exactly once here
    val sets = pages.select(col("host"), col("content_key")).distinct()
      .localCheckpoint(true)

    val minAggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("content_key"))).as(s"m$i"))
    val sigs = sets.groupBy("host").agg(minAggs.head, minAggs.tail: _*)

    val bandStructs = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        hash((b * rowsPer until (b + 1) * rowsPer).map(i => col(s"m$i")): _*)
          .cast("long").as("bucket"))): _*)
    val banded = Dedup.capBuckets(
      sigs.select(col("host"), explode(bandStructs).as("bc"))
        .select(col("host"), col("bc.band").as("band"),
          col("bc.bucket").as("bucket")),
      maxBucket, Seq("band", "bucket"))

    val candidates = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.host") < col("b.host"))
      .select(col("a.host").as("host_a"), col("b.host").as("host_b"))
      .dropDuplicates("host_a", "host_b")

    val sizes = sets.groupBy("host").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sets.select(col("host").as("host_a"), col("content_key")), Seq("host_a"))
      .join(sets.select(col("host").as("host_b"), col("content_key")),
        Seq("host_b", "content_key"))
      .groupBy("host_a", "host_b").agg(count(lit(1)).as("n_inter"))

    inter
      .join(sizes.select(col("host").as("host_a"), col("n").as("n_a")), Seq("host_a"))
      .join(sizes.select(col("host").as("host_b"), col("n").as("n_b")), Seq("host_b"))
      .select(col("host_a"), col("host_b"),
        // integer division (`div`), matching the oracle's `//` and the
        // bit-comparable micro-unit contract — see trapSignals
        expr("n_inter * 1000000L div (n_a + n_b - n_inter)").cast("long")
          .as("jaccard_micro"))
      .filter(col("jaccard_micro") >= minJaccardMicro)
  }

  /** Per-host boilerplate stripping (the CCNet template-removal pass): a
    * line occurring on at least `minDocs` pages AND at least
    * `minFracMicro`/1e6 of the host's pages is template chrome (nav,
    * footer, cookie banner) and is removed from every page of that host.
    * Output: (doc_id, clean_text) with surviving lines in original order.
    *
    * Shape: lines explode to narrow (host, line) rows (distinct per doc so
    * within-page repeats don't inflate the document frequency), one
    * groupBy (host, line) with map-side combine, the per-host boilerplate
    * SET collects into one array row per host (bounded: a template is tens
    * of lines; page bodies never qualify because they are unique), and the
    * strip itself is a broadcast-or-shuffle join back on host plus a pure
    * codegen'd `filter`/`array_join` — no second shuffle of the corpus.
    * The frac compare is integer cross-multiplication — no float.
    */
  def boilerplateStrip(docs: DataFrame, minDocs: Long = 2L,
      minFracMicro: Long = 800000L): DataFrame = {
    val pages = docs.groupBy("host").agg(count(lit(1)).as("n_pages"))
    val lineCounts = docs
      .select(col("host"), col("doc_id"),
        explode(array_distinct(split(col("text"), "\n"))).as("line"))
      .groupBy("host", "line").agg(count(lit(1)).as("n_docs"))
    val boiler = lineCounts.join(pages, Seq("host"))
      .filter(col("n_docs") >= minDocs &&
        col("n_docs") * lit(1000000L) >= col("n_pages") * minFracMicro)
      .groupBy("host").agg(collect_set(col("line")).as("boiler_lines"))
    docs.join(boiler, Seq("host"), "left")
      .select(col("doc_id"),
        array_join(filter(split(col("text"), "\n"), l =>
          not(coalesce(array_contains(col("boiler_lines"), l), lit(false)))),
          "\n").as("clean_text"))
  }

  /** Per-host URL-template histogram: URLs collapse to structural templates
    * (hex runs of 16+ chars → `H` first — session tokens/content hashes —
    * then digit runs → `N`), counted per (host, template). A host whose url
    * mass concentrates in one parameterized template (`/cal/N/N`,
    * `/item/N?sid=N`) is the infinite-calendar / session-id trap shape
    * BEFORE the duplicate content is ever fetched — the frontier-policy
    * complement to [[trapSignals]], which needs fetched bodies.
    * Map-only regexp (codegen'd, RE2-compatible) + one groupBy with
    * map-side combine. */
  def urlTemplates(urls: DataFrame): DataFrame =
    urls.select(col("host"),
        regexp_replace(
          regexp_replace(col("url"), "[0-9a-fA-F]{16,}", "H"),
          "[0-9]+", "N").as("template"))
      .groupBy("host", "template").agg(count(lit(1)).as("n_urls"))

  /** Proportional per-host crawl-budget apportionment with EXACT totals:
    * split a global wave budget across hosts proportional to a non-negative
    * integer weight (quality score, backlog depth, change rate — the
    * frontier-policy signals of [[trapSignals]]/[[Recrawl]]), rounded by the
    * largest-remainder (Hamilton) method so the allocations sum EXACTLY to
    * `budget` (when any weight is positive). Input `(host, weight)`; output
    * `(host, alloc)` covering every input host (weight ≤ 0 or null → 0).
    *
    * Determinism: all arithmetic is integer/decimal-exact (base share =
    * `budget*w div W`, remainder = `budget*w mod W`), so results are
    * bit-identical at any parallelism and across engines — a double
    * `sum(weight)` would be shuffle-order-dependent at the floor
    * boundaries. Ties in remainder break by host ascending.
    *
    * Scale shape: two narrow passes over the hosts frame (~10^7 rows at web
    * scale — never urls) with broadcast scalar totals; the remainder rank
    * that picks the `budget - Σbase` +1 winners uses range-bucketed
    * enumeration (the [[Sampling.globalRowNumbers]] treatment) — per-bucket
    * windows + broadcast offsets, no single-partition global sort. Equal
    * remainders always share a bucket, so cross-bucket order is total.
    * Known degradation: remainders are data values, not hashes, so a
    * pathologically uniform corpus (every host the same weight ⇒ every
    * remainder equal) collapses to ONE bucket and its window ranks all
    * hosts in a single task — still narrow (host, rem) rows, but
    * single-threaded; sub-bucketing cannot fix it without changing the
    * documented host-ascending tie order (the oracle's contract). */
  def crawlBudget(hosts: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val all = hosts.select(col("host"), col("weight"))
    val pos = all
      .select(col("host"), col("weight").cast(dec).as("w"))
      .filter(col("w") > 0)
    // the grand total and the deficit are single scalars: collect them
    // instead of cross-joining aggregate subtrees — a plan diamond would
    // re-evaluate the (possibly expensive) hosts input once per consumer
    // branch (the r3 frontier-view lesson); with the checkpoint below the
    // input is computed exactly twice (total, then the staged frame)
    val totRow = pos.agg(sum("w").cast(dec)).head()
    if (totRow.isNullAt(0)) // no positive weight: nothing to apportion
      return all.select(col("host"), lit(0L).as("alloc"))
    val tot = s"CAST('${totRow.getDecimal(0).toBigInteger}' AS $dec)"
    // one narrow (host, base, rem, bucket) frame, evaluated ONCE and
    // reused by the deficit scalar, the bucket offsets, and the rank join
    val staged = pos
      .withColumn("_prod", (lit(budget).cast(dec) * col("w")).cast(dec))
      .withColumn("_base", expr(s"_prod div $tot"))
      .withColumn("_rem", expr(s"CAST(_prod % $tot AS $dec)"))
      .withColumn("_rb", expr(s"CAST((_rem * 4096) div $tot AS INT)"))
      .select("host", "_base", "_rem", "_rb")
      .localCheckpoint()
    // `div` yields LongType, so the base sum is a plain long (<= budget)
    val deficit = budget -
      staged.agg(coalesce(sum("_base"), lit(0L))).head().getLong(0)
    // descending-remainder global rank without a global sort: range-bucket
    // the remainder (bucket is monotone in _rem, so equal remainders share
    // a bucket), broadcast per-bucket offsets, rank within buckets
    val offsets = staged.groupBy("_rb").agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(
        sum("_n").over(Window.orderBy(col("_rb").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_rb", "_off")
    val ranked = staged
      .join(broadcast(offsets), Seq("_rb"))
      .withColumn("_rank", col("_off") + row_number().over(
        Window.partitionBy("_rb").orderBy(col("_rem").desc, col("host")))
        .cast("long"))
      .select(col("host"),
        (col("_base") + when(col("_rank") <= lit(deficit), 1L)
          .otherwise(0L)).as("alloc"))
    all.select(col("host")).join(ranked, Seq("host"), "left")
      .select(col("host"), coalesce(col("alloc"), lit(0L)).as("alloc"))
  }

  /** Retroactive robots-compliance audit: flag every fetched url a host's
    * CURRENT robots.txt disallows for `agent`. The crawler enforces robots
    * at fetch time (P8), but a corpus outlives its crawl — sites change
    * their policies, corpora get merged from crawls with different
    * politeness settings, and takedown/compliance reviews ask exactly this
    * question of data that is already on disk.
    *
    * Input: pages `(url, host)` (+ any payload columns, passed through) and
    * the per-host robots catalog `(host, robots_txt)`; a host with no row
    * or an empty body allows everything (the fetch-time rule,
    * Scheduler.robotsAllowUdf). One host-keyed join (the robots side is
    * O(hosts)) + a map-only evaluation of the same RobotsCache-backed
    * matcher the scheduler gates with — audit verdicts are identical to
    * fetch-time verdicts by construction. */
  /** The ONE robots verdict both audits share (and the same matcher the
    * scheduler's fetch gate uses): a second copy could drift and break the
    * audit-equals-fetch-behavior guarantee. */
  private def robotsAllowUdf(agent: String) =
    udf { (txt: String, path: String) =>
      if (txt == null || txt.isEmpty) true
      else graft.crawl.RobotsCache.get(txt)
        .testAgent(if (path == null || path.isEmpty) "/" else path, agent)
    }

  def robotsAudit(pages: DataFrame, robots: DataFrame,
      agent: String): DataFrame = {
    val allowUdf = robotsAllowUdf(agent)
    pages.join(robots.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .withColumn("allowed",
        allowUdf(coalesce(col("robots_txt"), lit("")),
          graft.functions.Funcs.pathUdf(col("url"))))
      .drop("robots_txt")
  }

  /** Robots-policy DRIFT between two robots snapshots (the takedown-review
    * complement to [[robotsAudit]]'s point-in-time check): evaluate every
    * fetched url against the old and the new robots.txt of its host and
    * flag `newly_disallowed` — content that was collected legitimately but
    * whose host has since withdrawn permission (the set a periodic
    * compliance sweep re-reviews; policy-relaxed urls surface symmetrically
    * as allowed_new > allowed_old). Same matcher as the scheduler's fetch
    * gate, so drift verdicts are consistent with crawl behavior by
    * construction. Two host-keyed joins (robots sides O(hosts)) + map-only
    * evaluation — the pages side shuffles on host once per snapshot side. */
  def robotsDrift(pages: DataFrame, robotsOld: DataFrame,
      robotsNew: DataFrame, agent: String): DataFrame = {
    val allowUdf = robotsAllowUdf(agent)
    pages
      .join(robotsOld.select(col("host"), col("robots_txt").as("r_old")),
        Seq("host"), "left")
      .join(robotsNew.select(col("host"), col("robots_txt").as("r_new")),
        Seq("host"), "left")
      .withColumn("path_", graft.functions.Funcs.pathUdf(col("url")))
      .withColumn("allowed_old",
        allowUdf(coalesce(col("r_old"), lit("")), col("path_")))
      .withColumn("allowed_new",
        allowUdf(coalesce(col("r_new"), lit("")), col("path_")))
      .withColumn("newly_disallowed",
        col("allowed_old") && !col("allowed_new"))
      .drop("r_old", "r_new", "path_")
  }
}
