package graft.crawl

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import Model.{Page, SourceRow}

/** Deterministic synthetic page-table fixtures (FIXTURES.md).
  *
  * `staticSite` is a functional translation of the reference's test harness
  * site (/root/reference/static/index.html, gallery.html, styles.css served by
  * crawler_test.go:12-16): same hrefs, same decoys, same title, same empty
  * stylesheet — the inputs that pin the crawler_test.go:27-44 membership
  * golden table. `scaleSite` is the seeded scale-out web-graph generator for
  * throughput/scaling runs: H hosts × P pages/host, out-degree d with 80/20
  * intra/cross-host links, a content-extension fraction and per-host robots
  * with varied Crawl-delay. Same seed ⇒ identical input at any parallelism.
  */
object Fixtures {

  val FixtureHost = "127.0.0.1:8002"
  val FixtureRoot = s"http://$FixtureHost"
  val BaseTs: Timestamp = Model.VirtualEpoch

  val indexHtml: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |	<meta charset="utf-8">
      |	<title>ChinchilasAreFun.com</title>
      |	<meta content="do not crawl that please http://youShouldNotHaveThis.jingle</a>" name="keywords">
      |	<meta name="description" content="Just a simple chinchila gallery <a href=ThisIsNotALink.custom>linkao</a>">???</a>">
      |	<meta name="author" content="Chinchila">
      |	<link rel="stylesheet" href="./styles.css">
      |	<!--[if lt IE 9]>
      |		<script src="https://cdnjs.cloudflare.com/ajax/libs/html5shiv/3.7.3/html5shiv.js"></script>
      |	<![endif]-->
      |</head>
      |<body>
      |	<h1>Hello you all! Lets dance with chinchilas</h1>
      |	<a href="./gallery.html">Click here to see some chinchilas.</a><br />
      |	<a href="https://google.com/" target="_blank">Click here to go to a external website.</a><br />
      |	<a href="\\reddit.com">Click here to go to a external website using the same protocol.</a><br />
      |	<a href="ftp://ftp.6te.net/">Click here to access ftp from a random website.</a><br />
      |	<a href="mailto:somerandomemai@domain.co.ck">Email me if any problem ;)</a><br />
      |	&lt;a href="http://ThisIsNotALink.customdomain&gt;Do not try to click on me.&lt;/a&gt;<br />
      |	<a href="http://yahoo.com"><img src="./chinchila.jpg" /></a>
      |	<script src="./scripts.js"></script>
      |</body>
      |</html>
      |""".stripMargin

  val galleryHtml: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |	<meta charset="utf-8">
      |	<title>ChinchilasAreFun.com</title>
      |	<meta name="description" content="Just a simple chinchila gallery">
      |	<meta name="author" content="Chinchila">
      |	<link rel="stylesheet" href="./styles.css">
      |</head>
      |<body>
      |	<h1>Under construction.</h1>
      |	<h2><a href="./index.html">Back to index</a></h2>
      |</body>
      |</html>
      |""".stripMargin

  /** robots.txt exercising the gate + Crawl-delay (FIXTURES.md §1). */
  val fixtureRobots: String =
    """User-agent: *
      |Disallow: /private/
      |Crawl-delay: 1
      |""".stripMargin

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** The ported static site as Page rows. The http.FileServer in the
    * reference serves "/" and "/index.html" as the same file. */
  def staticSitePages: Seq[Page] = Seq(
    Page(FixtureRoot, BaseTs, utf8(indexHtml), "Hello you all! Lets dance with chinchilas", "en"),
    Page(s"$FixtureRoot/index.html", BaseTs, utf8(indexHtml),
      "Hello you all! Lets dance with chinchilas", "en"),
    Page(s"$FixtureRoot/gallery.html", BaseTs, utf8(galleryHtml), "Under construction.", "en"),
    Page(s"$FixtureRoot/styles.css", BaseTs, Array.emptyByteArray, "", ""),
    Page(s"$FixtureRoot/scripts.js", BaseTs, Array.emptyByteArray, "", ""),
    Page(s"$FixtureRoot/chinchila.jpg", BaseTs,
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 0, 0x10, 'J', 'F', 'I', 'F'),
      "", ""),
    Page(s"$FixtureRoot/robots.txt", BaseTs, utf8(fixtureRobots), fixtureRobots, "en")
  )

  /** The seed list from /root/reference/sql/test_data.sql:10-14. */
  def staticSiteSources: Seq[SourceRow] = Seq(
    SourceRow(
      id = "326fcfa0-d3e6-4b2d-8f95-e77220e16109",
      url = FixtureHost,
      title = "127.0.0.1",
      created = BaseTs, updated = BaseTs,
      primer_id = "5b1031f4-38a8-40b3-be91-c324bf686a87",
      crawl = true,
      stale_duration_ms = 43200000L))

  // ---------------------------------------------------------------- scale gen

  /** splitmix64 — deterministic, partition-friendly PRN from an index. */
  def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9eecb0b2b6e3bL
    z ^ (z >>> 31)
  }

  final case class ScaleConfig(
      hosts: Int = 16,
      pagesPerHost: Int = 64,
      outDegree: Int = 8,
      contentFraction: Double = 0.1, // .csv/.pdf content urls (content lane B)
      crossHostFraction: Double = 0.2,
      fillerParagraphs: Int = 24,    // body text mass (~Common-Crawl-ish pages)
      partitions: Int = 0,           // 0 = spark defaultParallelism
      adminPages: Boolean = false,   // add a /admin/ page per host (robots-disallowed)
      seed: Long = 42L)

  /** host%04d.example.com — manual zero-pad, byte-identical to the old
    * `f"host$h%04d..."` spelling: the printf interpolator builds a
    * java.util.Formatter per call, and the kernel calls this ~10^8 times
    * per bench run (every pageUrl of every generated link), where it was
    * a measurable slice of BOTH kernel phases (guide §1.2 step 2:
    * per-task work, after the job shape is right). */
  def hostName(h: Int): String = {
    val sb = new java.lang.StringBuilder(21)
    sb.append("host")
    if (h < 1000) { sb.append('0'); if (h < 100) { sb.append('0'); if (h < 10) sb.append('0') } }
    sb.append(h).append(".example.com").toString
  }

  def pageUrl(cfg: ScaleConfig, h: Int, p: Int): String = {
    val r = mix(cfg.seed, h.toLong * 1000003L + p)
    val isContent = p > 0 && (((r >>> 8) & 0xffff).toDouble / 65536.0) < cfg.contentFraction
    val ext = if (isContent) { if ((r & 1) == 0L) ".csv" else ".pdf" } else ".html"
    // append-based (no interpolator allocations) — identical bytes
    val sb = new java.lang.StringBuilder(48)
    sb.append("http://")
    sb.append(hostName(h))
    if (p != 0) sb.append("/page").append(p).append(ext)
    sb.toString
  }

  /** Deterministic html for page (h,p): out-degree links, 80/20 intra/cross. */
  def pageHtml(cfg: ScaleConfig, h: Int, p: Int): String = {
    // presized + append-based: the old per-link s"..." interpolations and
    // default-capacity growth were pure allocator traffic on the kernel's
    // hot path; output is byte-identical
    val sb = new StringBuilder(
      80 + cfg.outDegree * 64 + cfg.fillerParagraphs * 190)
    sb.append("<!doctype html><html><head><title>Page ").append(h)
      .append('/').append(p).append("</title></head><body>\n")
    var k = 0
    while (k < cfg.outDegree) {
      val r = mix(cfg.seed, (h.toLong * 1000003L + p) * 131L + k)
      val cross = (((r >>> 16) & 0xffff).toDouble / 65536.0) < cfg.crossHostFraction
      val th = if (cross) (math.abs(r.toInt) % cfg.hosts) else h
      val tp = math.abs((r >>> 32).toInt) % cfg.pagesPerHost
      sb.append("<a href=\"").append(pageUrl(cfg, th, tp))
        .append("\">link ").append(k).append("</a>\n")
      k += 1
    }
    if (cfg.adminPages && p == 0)
      sb.append(s"""<a href="http://${hostName(h)}/admin/secret.html">admin</a>\n""")
    var f = 0
    while (f < cfg.fillerParagraphs) {
      val r = mix(cfg.seed, (h.toLong * 1000003L + p) * 977L + f)
      sb.append("<p>paragraph ").append(f).append(' ')
      var wTok = 0
      while (wTok < 18) {
        sb.append("word").append(((r >>> (wTok % 48)) & 0x3ff)).append(' ')
        wTok += 1
      }
      sb.append("</p>\n")
      f += 1
    }
    sb.append("</body></html>\n")
    sb.toString
  }

  def robotsFor(cfg: ScaleConfig, h: Int): String = {
    val r = mix(cfg.seed, 777L + h)
    val delay = 1 + (math.abs(r.toInt) % 3) // 1..3 virtual seconds
    s"User-agent: *\nDisallow: /admin/\nCrawl-delay: $delay\n"
  }

  /** Distributed page-table generator — built from spark.range so generation
    * itself scales and is identical at any parallelism. */
  def scaleSitePages(spark: SparkSession, cfg: ScaleConfig): Dataset[Page] = {
    import spark.implicits._
    val n = cfg.hosts.toLong * cfg.pagesPerHost
    val parts = if (cfg.partitions > 0) cfg.partitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n + cfg.hosts, 1, parts)
      .map { i =>
        if (i < n) {
          val h = (i / cfg.pagesPerHost).toInt
          val p = (i % cfg.pagesPerHost).toInt
          val u = pageUrl(cfg, h, p)
          val html = if (u.endsWith(".csv")) s"col_a,col_b\n$h,$p\n"
                     else if (u.endsWith(".pdf")) "%PDF-1.4 synthetic"
                     else pageHtml(cfg, h, p)
          Page(u, BaseTs, html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            s"text of $h/$p", "en")
        } else {
          val h = (i - n).toInt
          val robots = robotsFor(cfg, h)
          Page(s"http://${hostName(h)}/robots.txt", BaseTs,
            robots.getBytes(java.nio.charset.StandardCharsets.UTF_8), robots, "en")
        }
      }
  }

  /** Url column of the scale site WITHOUT building page bodies — the
    * URL-seen table side of J8 (the engine probes the urls table there;
    * only link extraction needs the html). Same url universe as
    * scaleSitePages. */
  def scaleSiteUrls(spark: SparkSession, cfg: ScaleConfig): Dataset[String] = {
    import spark.implicits._
    val n = cfg.hosts.toLong * cfg.pagesPerHost
    val parts = if (cfg.partitions > 0) cfg.partitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n + cfg.hosts, 1, parts).map { i =>
      if (i < n)
        pageUrl(cfg, (i / cfg.pagesPerHost).toInt, (i % cfg.pagesPerHost).toInt)
      else s"http://${hostName((i - n).toInt)}/robots.txt"
    }
  }

  /** The /admin/ pages (present in the site, disallowed by robots). */
  def adminPages(cfg: ScaleConfig): Seq[Page] =
    if (!cfg.adminPages) Seq.empty
    else (0 until cfg.hosts).map { h =>
      Page(s"http://${hostName(h)}/admin/secret.html", BaseTs,
        "<html><title>secret</title></html>".getBytes("UTF-8"), "secret", "en")
    }

  def scaleSiteSources(cfg: ScaleConfig, crawlingHosts: Int): Seq[SourceRow] =
    (0 until crawlingHosts).map { h =>
      SourceRow(
        id = graft.functions.Hashing.urlId(hostName(h)),
        url = hostName(h),
        title = hostName(h),
        // created desc order drives the 200-source seed cap (crawler.go:139);
        // stagger creation times so the order is total and deterministic
        created = new Timestamp(BaseTs.getTime - h * 1000L),
        updated = BaseTs,
        primer_id = "p-0", crawl = true, stale_duration_ms = 43200000L)
    }

  def pagesDF(spark: SparkSession, pages: Seq[Page]): DataFrame = {
    import spark.implicits._
    spark.createDataset(pages).toDF()
  }

  def sourcesDF(spark: SparkSession, sources: Seq[SourceRow]): DataFrame = {
    import spark.implicits._
    spark.createDataset(sources).toDF()
  }
}
