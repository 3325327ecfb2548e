package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.crawl._

/** Read-API surface (S9), lane-C seeding (POST /que), and MOR compaction
  * invariance. */
class ApiCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val MY = Fixtures.FixtureRoot

  private def crawl(cfg: CrawlConfig, seedC: Option[String] = None): Scheduler = {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val store = new TableStore(spark, SparkTestBase.tempDir("api-crawl"))
    val sched = new Scheduler(spark, store, cfg)
    sched.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    seedC.foreach(sched.seedUrl)
    sched.run(maxWaves = 40)
    sched
  }

  private lazy val sched = crawl(CrawlConfig())
  private lazy val api = new Api(sched)

  test("listUrls pagination and ordering (S1/S3/O1)") {
    val all = api.listUrls(100, 0).select("url").as[String].collect()
    assert(all.length == 9)
    val page2 = api.listUrls(3, 3).select("url").as[String].collect()
    assert(page2.toSeq == all.slice(3, 6).toSeq)
  }

  test("fetched/unfetched split (P10)") {
    val fetched = api.fetchedUrls(100, 0).select("url").as[String].collect().toSet
    val unfetched = api.unfetchedUrls(100, 0).select("url").as[String].collect().toSet
    assert(fetched.contains(MY) && fetched.contains(s"$MY/styles.css"))
    assert(unfetched.contains("https://google.com/"))
    assert((fetched ++ unfetched).size == 9)
  }

  test("point lookup and search (S2/P13)") {
    assert(api.urlByString(MY).count() == 1)
    val hits = api.search("GALLERY").select("url").as[String].collect()
    assert(hits.toSeq == Seq(s"$MY/gallery.html"))
  }

  test("outbound/inbound link docs (J1/J2)") {
    val out = api.outboundLinks(MY).select("url").as[String].collect().toSet
    assert(out.size == 7 && out.contains("http://reddit.com"))
    val in = api.inboundLinks(s"$MY/styles.css").select("url").as[String].collect().toSet
    assert(in == Set(MY, s"$MY/index.html", s"$MY/gallery.html"))
  }

  test("snapshots and stats and empty queue at quiescence (A1/A10)") {
    assert(api.snapshotsForUrl(MY).count() == 1)
    val s = api.stats().collect().head
    assert(s.getAs[Long]("urls") == 9L)
    assert(s.getAs[Long]("fetched") + s.getAs[Long]("unfetched") == 9L)
    assert(api.queue().count() == 0)
  }

  test("lane C seeding (POST /que, seed_crawler): GET on lane C, links feed lane A") {
    val schedC = crawl(CrawlConfig(), seedC = Some(s"$MY/gallery.html"))
    val laneC = schedC.fetchLogView.filter($"lane" === "C").collect()
    assert(laneC.length == 2) // robots + the seeded GET
    assert(laneC.exists(r => r.getAs[String]("url") == s"$MY/gallery.html" &&
      r.getAs[String]("outcome") == "ok"))
    // gallery's links were stored and /index.html was crawled via lane A
    val urls = schedC.urlsView.select("url").as[String].collect().toSet
    assert(urls.contains(s"$MY/index.html"))
    val laneAIndex = schedC.fetchLogView.filter($"lane" === "A" &&
      $"url" === s"$MY/index.html").count()
    assert(laneAIndex >= 1)
  }

  test("compaction leaves all views unchanged (T6/Iceberg rewrite equivalence)") {
    val compacted = crawl(CrawlConfig(compactEvery = 2))
    def canon(s: Scheduler) = (
      s.urlsView.selectExpr(
        "concat(url,'|',status,'|',coalesce(title,''),'|',coalesce(cast(last_get as string),''))")
        .as[String].collect().sorted.toSeq,
      s.linksView.selectExpr("concat(src,'|',dst)").as[String].collect().sorted.toSeq,
      s.snapshotsView.selectExpr("concat(url,'|',created)").as[String].collect().sorted.toSeq)
    assert(canon(compacted) == canon(sched))
  }
}
