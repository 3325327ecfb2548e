package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.crawl._

/** End-to-end golden crawl over the ported fixture site — the
  * crawler_test.go:27-44 membership table plus link/order/politeness
  * invariants (SURVEY §5.2, FIXTURES.md §1). */
class CrawlerGoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshCrawl(shufflePartitions: Int): TableStore = {
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val store = new TableStore(spark, SparkTestBase.tempDir("crawl"))
    val sched = new Scheduler(spark, store, CrawlConfig())
    sched.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    sched.run(maxWaves = 40)
    store
  }

  private lazy val store = freshCrawl(4)
  private lazy val sched = new Scheduler(spark, store, CrawlConfig())

  private val MY = Fixtures.FixtureRoot

  test("crawler_test.go membership golden table") {
    val urls = sched.urlsView.select("url").as[String].collect().toSet
    // expected = true (crawler_test.go:32-43)
    assert(urls.contains(MY))
    assert(urls.contains(s"$MY/gallery.html"))
    assert(urls.contains(s"$MY/styles.css"))
    assert(urls.contains("https://google.com/"))
    assert(urls.contains("http://reddit.com"))
    assert(urls.contains("ftp://ftp.6te.net/"))
    assert(urls.contains("mailto:somerandomemai@domain.co.ck"))
    assert(urls.contains("http://yahoo.com"))
    // expected = false (crawler_test.go:28-31)
    assert(!urls.contains("http://youShouldNotHaveThis.jingle"))
    assert(!urls.contains("ThisIsNotALink.custom"))
    assert(!urls.contains("http://ThisIsNotALink.customdomain"))
    assert(!urls.contains(s"${MY}chinchila.jpg"))
    assert(!urls.exists(_.endsWith("chinchila.jpg")))
    assert(!urls.exists(_.endsWith("robots.txt"))) // robots is not a Url row
    assert(!urls.exists(_.endsWith("scripts.js"))) // script src is not [href]
    // full membership: the 8 above + /index.html discovered via gallery
    assert(urls == Set(MY, s"$MY/index.html", s"$MY/gallery.html", s"$MY/styles.css",
      "https://google.com/", "http://reddit.com", "ftp://ftp.6te.net/",
      "mailto:somerandomemai@domain.co.ck", "http://yahoo.com"))
  }

  test("link graph rows") {
    val links = sched.linksView.select("src", "dst").as[(String, String)].collect().toSet
    val fromIndex = Set(
      s"$MY/styles.css", s"$MY/gallery.html", "https://google.com/",
      "http://reddit.com", "ftp://ftp.6te.net/",
      "mailto:somerandomemai@domain.co.ck", "http://yahoo.com")
    assert(links.filter(_._1 == MY).map(_._2) == fromIndex)
    assert(links.filter(_._1 == s"$MY/index.html").map(_._2) == fromIndex)
    assert(links.filter(_._1 == s"$MY/gallery.html").map(_._2) ==
      Set(s"$MY/styles.css", s"$MY/index.html"))
    assert(links.size == 16)
  }

  test("url state fields after crawl") {
    val rows = sched.urlsView.collect().map(r => r.getAs[String]("url") -> r).toMap
    val root = rows(MY)
    assert(root.getAs[String]("title") == "ChinchilasAreFun.com")
    assert(root.getAs[String]("content_sniff") == "text/html; charset=utf-8")
    assert(root.getAs[Int]("status") == 200)
    assert(root.getAs[java.sql.Timestamp]("last_get") != null)

    val styles = rows(s"$MY/styles.css")
    assert(styles.getAs[String]("content_sniff") == "text/plain; charset=utf-8")
    assert(styles.getAs[Long]("content_length") == 0L)
    assert(styles.getAs[java.sql.Timestamp]("last_get") != null)
    assert(styles.getAs[String]("content_type").startsWith("text/css"))

    // off-whitelist hosts: stored but never successfully fetched
    val google = rows("https://google.com/")
    assert(google.getAs[java.sql.Timestamp]("last_get") == null)
    assert(google.getAs[java.sql.Timestamp]("last_head") == null)
    assert(google.getAs[Int]("status") == 0)
    // unfetchable schemes: stored, never enqueued
    assert(rows("ftp://ftp.6te.net/").getAs[Int]("status") == 0)
    assert(rows("mailto:somerandomemai@domain.co.ck").getAs[Int]("status") == 0)
  }

  test("politeness: per-(host,lane) fetch gaps respect the effective delay") {
    val log = sched.fetchLogView
      .filter($"outcome".isin("ok", "error", "disallowed"))
      .select($"host", $"lane", $"vt").as[(String, String, Double)]
      .collect().groupBy(t => (t._1, t._2))
    log.foreach { case ((host, lane), rows) =>
      val vts = rows.map(_._3).sorted
      vts.sliding(2).foreach {
        case Array(a, b) =>
          assert(b - a >= 0.999, s"politeness violated on $host/$lane: $a -> $b")
        case _ => ()
      }
    }
    assert(log.nonEmpty)
  }

  test("robots fetched once per (host,lane); snapshots GET-only") {
    val robots = sched.fetchLogView.filter($"outcome" === "robots")
      .select("host", "lane").as[(String, String)].collect()
    assert(robots.length == robots.distinct.length)
    // fixture host fetched robots on lane A (graph walk) and lane B (styles.css content GET)
    assert(robots.count(_._1 == Fixtures.FixtureHost) == 2)

    val snaps = sched.snapshotsView.select("url").as[String].collect()
    assert(snaps.count(_ == MY) == 1)
    assert(snaps.nonEmpty)
    // styles.css is content-GET'd repeatedly (lastHead stays null, matching
    // sentry's ShouldEnqueueHead gate) — every GET appends a snapshot
    assert(snaps.count(_ == s"$MY/styles.css") >= 1)
  }

  test("determinism: identical outputs at different shuffle parallelism") {
    val store2 = freshCrawl(8)
    val sched2 = new Scheduler(spark, store2, CrawlConfig())
    def canon(s: Scheduler): (Seq[String], Seq[String], Seq[String]) = (
      s.urlsView.select($"url", $"status".cast("string"), $"title",
        $"content_sniff", $"last_get".cast("string"), $"last_head".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq,
      s.linksView.select($"src", $"dst", $"created".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq,
      s.fetchLogView.select($"wave".cast("string"), $"vt".cast("string"), $"host",
        $"lane", $"method", $"url", $"seq".cast("string"), $"outcome")
        .collect().map(_.mkString("|")).sorted.toSeq)
    val a = canon(sched)
    val b = canon(sched2)
    assert(a._1 == b._1, "urls differ across parallelism")
    assert(a._2 == b._2, "links differ across parallelism")
    assert(a._3 == b._3, "crawl order differs across parallelism")
  }

  test("resume: killed-and-resumed run produces identical crawl order") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = SparkTestBase.tempDir("resume")
    val storeA = new TableStore(spark, dir)
    val schedA = new Scheduler(spark, storeA, CrawlConfig())
    schedA.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    // run two waves, then "kill" (drop all in-memory state)
    schedA.runWave(0)
    schedA.runWave(1)
    // resume from the manifest in a fresh store/scheduler
    val storeB = new TableStore(spark, dir)
    assert(storeB.currentWave == 1)
    val schedB = new Scheduler(spark, storeB, CrawlConfig())
    schedB.run(maxWaves = 40)

    def logOf(s: Scheduler) = s.fetchLogView
      .select($"wave".cast("string"), $"vt".cast("string"), $"host", $"lane",
        $"method", $"url", $"seq".cast("string"), $"outcome")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(logOf(schedB) == logOf(sched), "resumed crawl order differs")
    assert(sched.urlsView.count() == schedB.urlsView.count())
  }
}
