package graft.crawl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-API surface (SURVEY §2.1 S9, §3.3): the query helpers behind the
  * reference's JSON endpoints (/urls, /sources, /que, /mem and the url
  * detail routes), expressed as DataFrame plans over the engine's tables.
  * Pagination follows the reference's page/pageSize → LIMIT/OFFSET plumbing
  * (page.go:13-39); orderings reproduce the SQL constants in
  * core/queries.go with deterministic url tiebreaks.
  */
final class Api(sched: Scheduler) {

  private val urlCols = Seq("url", "created", "updated", "last_head", "last_get",
    "status", "content_type", "content_sniff", "content_length", "file_name",
    "title", "id", "headers_took", "download_took", "headers", "meta", "hash")

  /** GET /urls (qUrlsList: order by created desc limit/offset). */
  def listUrls(limit: Int, offset: Int): DataFrame =
    sched.urlsView.orderBy(desc("created"), asc("url"))
      .select(urlCols.map(col): _*).offset(offset).limit(limit)

  /** GET /urls?fetched=true (qUrlsFetched, queries.go:608-616). */
  def fetchedUrls(limit: Int, offset: Int): DataFrame =
    sched.urlsView.filter(col("last_get").isNotNull)
      .orderBy(desc("created"), asc("url"))
      .select(urlCols.map(col): _*).offset(offset).limit(limit)

  /** unfetched urls (qUrlsUnfetched, queries.go:618-626). */
  def unfetchedUrls(limit: Int, offset: Int): DataFrame =
    sched.urlsView.filter(col("last_get").isNull)
      .orderBy(desc("created"), asc("url"))
      .select(urlCols.map(col): _*).offset(offset).limit(limit)

  /** point lookup by url string (S2, qUrlByUrlString). */
  def urlByString(url: String): DataFrame =
    sched.urlsView.filter(col("url") === url)

  /** search (P13, qUrlSearch: url ilike '%q%' limit 50). */
  def search(q: String, limit: Int = 50): DataFrame =
    sched.urlsView.filter(lower(col("url")).contains(q.toLowerCase))
      .orderBy(asc("url")).select("url", "title", "status").limit(limit)

  /** outbound link docs (J1: links.src=$1 AND links.dst=urls.url). */
  def outboundLinks(srcUrl: String): DataFrame = {
    val u = sched.urlsView
    val l = sched.linksView.filter(col("src") === srcUrl)
    broadcast(l).join(u, l("dst") === u("url"))
      .select(u("url"), col("title"), col("status"), col("content_sniff"))
  }

  /** inbound links (J2: links.dst=$1 AND links.src=urls.url). */
  def inboundLinks(dstUrl: String): DataFrame = {
    val u = sched.urlsView
    val l = sched.linksView.filter(col("dst") === dstUrl)
    broadcast(l).join(u, l("src") === u("url"))
      .select(u("url"), col("title"), col("status"))
  }

  /** snapshots for a url (qSnapshotsByUrl). */
  def snapshotsForUrl(url: String): DataFrame =
    sched.snapshotsView.filter(col("url") === url).orderBy(asc("created"))

  /** GET /que — current queued commands in per-host FIFO order. */
  def queue(limit: Int = 1000): DataFrame =
    sched.frontierView.filter(col("state") === Model.StateQueued)
      .orderBy(asc("host"), asc("seq"))
      .select("url", "method", "host", "lane", "wave", "seq").limit(limit)

  /** /mem-ish gauge (crawler.go:334-349): depths per lane + totals. */
  def stats(): DataFrame =
    sched.urlsView.agg(
      count(lit(1)).as("urls"),
      count(col("last_get")).as("fetched"),
      sum(when(col("last_get").isNull, 1).otherwise(0)).as("unfetched"))

  /** GET /sources (handlers.go:110-140; qSourcesList: created desc,
    * paginated). The sources table is the crawl's seed catalog. */
  def listSources(limit: Int, offset: Int): DataFrame =
    sched.sourcesDF.orderBy(desc("created"), asc("url"))
      .offset(offset).limit(limit)

  /** GET /sources?crawling=true twin (qSourcesCrawling, queries.go:455-464). */
  def crawlingSources(limit: Int, offset: Int): DataFrame =
    sched.sourcesDF.filter(col("crawl") === true)
      .orderBy(desc("created"), asc("url"))
      .offset(offset).limit(limit)

  /** GET /uncrawlables (qUncrawlablesList, queries.go:753-765). */
  def listUncrawlables(limit: Int, offset: Int): DataFrame =
    sched.uncrawlablesView.orderBy(desc("created"), asc("url"))
      .offset(offset).limit(limit)

  /** GET /repositories (qDataRepos, queries.go:149-156) over the real
    * catalog table (Mutations.createDataRepo writes it). */
  def listDataRepos(mut: Mutations, limit: Int, offset: Int): DataFrame =
    mut.dataRepos.filter(!col("deleted"))
      .orderBy(desc("created"), asc("id"))
      .select("id", "created", "updated", "title", "description", "url")
      .offset(offset).limit(limit)

  /** GET custom crawls (qCustomCrawlsList, queries.go:825-832). */
  def listCustomCrawls(mut: Mutations, limit: Int, offset: Int): DataFrame =
    mut.customCrawls.orderBy(desc("created"), asc("id"))
      .offset(offset).limit(limit)
}
