package graft.crawl

import java.sql.Timestamp

/** Typed data model for the crawl engine (SURVEY §1).
  *
  * Shapes follow the reference schema (/root/reference/sql/schema.sql,
  * vendor/github.com/datatogether/core/queries.go:553-572,159-166,519-527)
  * mapped to flat case classes with Spark Encoders. Timestamps are UTC,
  * second precision (core/url.go:433-436). Ids are deterministic sha-derived
  * surrogates (SURVEY §7.4) — sentry's uuid.New() per insert is
  * irreproducible by design.
  */
object Model {

  /** Virtual-clock epoch: all deterministic timestamps are epoch + vt
    * seconds (replaces sentry's wall-clock time.Now(), SURVEY §7.4). */
  val VirtualEpoch: Timestamp = Timestamp.valueOf("2017-01-01 00:00:01")

  /** Input table (BASELINE.json input_hint): Common-Crawl-style page. */
  final case class Page(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** urls table — one row per unique verbatim absolute url string
    * (core/url.go:45-99). The frontier's URL-seen source of truth. */
  final case class UrlRow(
      url: String,
      created: Timestamp,
      updated: Timestamp,
      last_head: Option[Timestamp],
      last_get: Option[Timestamp],
      status: Int,
      content_type: String,
      content_sniff: String,
      content_length: Long,
      file_name: String,
      title: String,
      id: String,
      headers_took: Int,
      download_took: Int,
      headers: Seq[String], // [k,v,k,v,...] ordering-faithful (url.go:85-87)
      meta: Map[String, String],
      hash: String)

  /** links table — directed edge, unique on (src,dst) (core/link.go:20-31). */
  final case class LinkRow(
      created: Timestamp,
      updated: Timestamp,
      src: String,
      dst: String)

  /** snapshots table — append-only GET record (core/snapshot.go:14-27). */
  final case class SnapshotRow(
      url: String,
      created: Timestamp,
      status: Int,
      duration: Long,
      headers: Seq[String],
      hash: String)

  /** sources table — crawl seed roots (core/source.go:19-46). `deleted` is
    * the soft-delete flag (sql/schema.sql sources.deleted; qSourcesCrawling
    * filters `crawl=true AND deleted=false`, core/queries.go:455-464). */
  final case class SourceRow(
      id: String,
      url: String, // root prefix WITHOUT scheme; AsUrl prepends http:// (source.go:125)
      title: String,
      created: Timestamp,
      updated: Timestamp,
      primer_id: String,
      crawl: Boolean,
      stale_duration_ms: Long,
      deleted: Boolean = false)

  /** Frontier states. */
  val StateQueued = "queued"
  /** Transition state for a command leaving the queue (budgeted take or a
    * manual eviction) — the frontier table is merge-on-read append-only
    * (like urls): a `taken` transition is the MOR tombstone that removes
    * the url from the read view, so a wave writes O(delta) transition rows
    * instead of rewriting the O(frontier) table. */
  val StateTaken = "taken"
  /** HEAD responses nothing handles leave the url occupying its `enqued`
    * slot forever (fetchbot mux no-op DefaultHandler, handler.go:62-64 +
    * crawler.go registers only a text/html HEAD handler) — modeled as a
    * blocked tombstone that keeps winning the enqueue anti-join. */
  val StateBlocked = "blocked"

  /** frontier — the distributed command queue (replaces fetchbot's
    * per-host channel + sliceIQ, fetch.go:119-128 / iq_slice.go:28-69). */
  final case class FrontierRow(
      url: String,
      method: String, // GET | HEAD
      host: String,   // Go URL.Host (with port) — partition affinity key (fetch.go:284-315)
      lane: String,   // A main | B content | C seed  (SURVEY §2.8 T8)
      wave: Long,     // wave the command was enqueued in
      seq: Long,      // global monotone enqueue sequence — per-host FIFO key (iq_slice order)
      state: String,  // queued | blocked
      /** Recrawl staleness score, frozen at enqueue time: seconds since the
        * url's last relevant fetch as of the enqueuing wave (never-fetched =
        * max). Computed from columns the enqueue path already holds — no
        * extra join, no take-time scoring pass over the backlog — so the
        * priority take stays O(budget) at a 10^10-row frontier. Ordering key
        * only when CrawlConfig.stalenessPriority is set; the default FIFO
        * ignores it (reference parity: fetchbot queues are FIFO). */
      prio_score: Long = 0L)

  /** Per-host politeness + robots state (fetchbot processChan locals,
    * fetch.go:345-425, lifted into a table so any executor count works). */
  final case class HostStateRow(
      host: String,
      lane: String,           // each fetcher (A/B/C) keeps its own per-host worker state
      robots_fetched: Boolean,
      robots_txt: String,     // raw robots body ("" = none/allow-all)
      crawl_delay_sec: Double, // effective delay (robots Crawl-delay override, fetch.go:377-386)
      next_fetch_vt: Double)  // virtual time when this host may fetch next

  /** Crawl-order evidence: one row per executed fetch, totally ordered by
    * (wave, vt, host, seq). The north rule's exact-match artifact. */
  final case class FetchLogRow(
      wave: Long,
      vt: Double, // virtual fetch time (politeness-spaced)
      host: String,
      lane: String,
      method: String,
      url: String,
      seq: Long,
      status: Int,
      outcome: String) // ok | error | disallowed | robots

  /** Per-partition lineage rows per wave (north_rule resumability evidence). */
  final case class LineageRow(
      wave: Long,
      table: String,
      partition_id: Int,
      rows: Long,
      version: Long)
}
