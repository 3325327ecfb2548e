package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.crawl._

/** Write-path CRUD round-trips (handlers.go:110-230 equivalents): create →
  * read → update → soft-delete for sources/primers, hard delete for
  * collections, hash-chain append with prev validation for metadata — and
  * the read queries staying correct over mutated state. */
class MutationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshMut(tag: String): Mutations =
    new Mutations(spark, new TableStore(spark, SparkTestBase.tempDir(tag)))

  test("sources: create is url-unique, update targets live rows, delete is soft") {
    val m = freshMut("mut-src")
    val id = m.createSource("example.com", "Example", "p-1", crawl = true, vtSec = 1)
    assert(m.createSource("example.com", "Other", "p-2", crawl = false, vtSec = 2) == id,
      "url UNIQUE constraint: second create must return the existing id")
    assert(m.sources.count() == 1)

    m.updateSource(id, title = Some("Renamed"), crawl = Some(false), vtSec = 3)
    val row = m.sources.filter($"id" === id).collect().head
    assert(row.getAs[String]("title") == "Renamed")
    assert(!row.getAs[Boolean]("crawl"))

    m.deleteSourceByUrl("example.com")
    val after = m.sources.filter($"id" === id).collect().head
    assert(after.getAs[Boolean]("deleted"), "qSourceDelete is a soft delete")
    assert(m.sources.count() == 1, "soft-deleted row still stored")

    // soft-deleted source is invisible to the crawling-sources read
    // (qSourcesCrawling: crawl=true AND deleted=false)
    assert(m.sources.filter($"crawl" && !$"deleted").count() == 0)
  }

  test("primers: hierarchy reads respect soft delete") {
    val m = freshMut("mut-primer")
    val root = m.createPrimer("rt", "Root", "top", parentId = "", vtSec = 1)
    val kid = m.createPrimer("kd", "Kid", "child", parentId = root, vtSec = 2)
    assert(m.subPrimers(root).select("id").as[String].collect().toSeq == Seq(kid))
    m.updatePrimer(kid, description = Some("updated child"), vtSec = 3)
    assert(m.subPrimers(root).select("description").as[String].head() == "updated child")
    m.deletePrimer(kid)
    assert(m.subPrimers(root).count() == 0, "qPrimerSubPrimers filters deleted")
    assert(m.primers.count() == 2, "soft delete keeps the row")
  }

  test("collections: item upsert/order and HARD delete with item cascade") {
    val m = freshMut("mut-coll")
    val cid = m.createCollection("alice", "Favorites", "http://c/", vtSec = 1)
    m.putCollectionItem(cid, "u1", idx = 1, "one")
    m.putCollectionItem(cid, "u2", idx = 0, "zero")
    m.putCollectionItem(cid, "u1", idx = 2, "one-moved") // upsert same key
    val urls = Seq(("u1", "http://a/", "A"), ("u2", "http://b/", "B"))
      .toDF("id", "url", "title")
    val page = Collections.items(m.collectionItems, urls, cid, limit = 10, offset = 0)
      .select("url_id").as[String].collect().toSeq
    assert(page == Seq("u2", "u1"), "curator index orders items after upsert")
    assert(m.collectionItems.count() == 2)

    m.deleteCollectionItem(cid, "u2")
    assert(m.collectionItems.count() == 1)
    m.deleteCollection(cid)
    assert(m.collections.count() == 0 && m.collectionItems.count() == 0,
      "qCollectionDelete is a hard delete with item cascade")
  }

  test("metadata: hash-chain append validates prev; reads see the chain") {
    val m = freshMut("mut-meta")
    val h1 = m.putMetadata("k1", "s1", prev = "", metaJson = """{"v":1}""", vtSec = 1)
      .getOrElse(fail("first append rejected"))
    assert(h1.startsWith("1220"))
    // stale prev rejected
    assert(m.putMetadata("k1", "s1", prev = "", metaJson = """{"v":2}""", vtSec = 2).isLeft)
    val h2 = m.putMetadata("k1", "s1", prev = h1, metaJson = """{"v":2}""", vtSec = 2)
      .getOrElse(fail("chained append rejected"))
    assert(h2 != h1 && m.latestHash("k1", "s1") == h2)
    // independent chain for another subject
    val g1 = m.putMetadata("k1", "s2", prev = "", metaJson = """{"w":1}""", vtSec = 3)
    assert(g1.isRight)

    // the reference read shapes over the mutated store
    val latest = Metadata.latestForKey(m.metadata, "k1", limit = 10, offset = 0)
      .collect().map(r => r.getAs[String]("subject") -> r.getAs[String]("hash")).toMap
    assert(latest == Map("s1" -> h2, "s2" -> g1.toOption.get))
    m.deleteMetadata("k1", "s1", vtSec = 4)
    assert(Metadata.subjectsWithMeta(m.metadata).as[String].collect().toSet == Set("s2"))
  }

  test("data repos / custom crawls: real catalog tables behind the list APIs") {
    val store = new TableStore(spark, SparkTestBase.tempDir("mut-repos"))
    val m = new Mutations(spark, store)
    val api = new Api(new Scheduler(spark, store, CrawlConfig()))
    val r1 = m.createDataRepo("Repo A", "first", "http://a/", vtSec = 1)
    val r2 = m.createDataRepo("Repo B", "second", "http://b/", vtSec = 2)
    assert(api.listDataRepos(m, 10, 0).select("id").as[String].collect().toSet ==
      Set(r1, r2))
    m.deleteDataRepo(r1)
    assert(api.listDataRepos(m, 10, 0).select("id").as[String].collect().toSeq ==
      Seq(r2), "qDataRepoDelete is a hard delete")
    m.createCustomCrawl("gh/x", "http://orig/", "run-1", vtSec = 3)
    val cc = api.listCustomCrawls(m, 10, 0).collect()
    assert(cc.length == 1 && cc.head.getAs[String]("github_repo") == "gh/x")
  }

  test("uncrawlables: insert/update/hard-delete round-trip (queries.go:729-808)") {
    val m = freshMut("mut-unc")
    val id = m.createUncrawlable("http://x/bad", "Ana", "a@example.org",
      "broken portal", vtSec = 1)
    assert(m.listUncrawlables(10, 0).select("url").as[String].collect().toSeq ==
      Seq("http://x/bad"))
    // url is the PRIMARY KEY: re-insert upserts, never duplicates
    assert(m.createUncrawlable("http://x/bad", "Bo", "b@example.org", "still broken",
      vtSec = 2) == id)
    assert(m.uncrawlables.count() == 1)
    m.updateUncrawlable(id, comments = Some("escalated"), vtSec = 3)
    val row = m.uncrawlables.filter($"id" === id).collect().head
    assert(row.getAs[String]("comments") == "escalated")
    assert(row.getAs[String]("name") == "Bo")
    m.deleteUncrawlable("http://x/bad")
    assert(m.uncrawlables.count() == 0, "qUncrawlableDelete is a hard delete by url")
  }

  test("deleting an uncrawlable un-blocks the url for the crawler") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val store = new TableStore(spark, SparkTestBase.tempDir("mut-unblock"))
    val m = new Mutations(spark, store)
    val sched = new Scheduler(spark, store, CrawlConfig())
    sched.bootstrap(Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    val victim = s"${Fixtures.FixtureRoot}/gallery.html"
    sched.markUncrawlable(victim)
    sched.run(maxWaves = 40)
    assert(sched.fetchLogView.filter($"url" === victim && $"seq" >= 0).count() == 0,
      "blocked url was fetched")
    // hard delete un-blocks: the next seed wave picks it up as a whitelisted
    // unfetched url and the crawler fetches it — no store surgery needed
    m.deleteUncrawlable(victim)
    sched.run(maxWaves = 60)
    assert(sched.fetchLogView.filter($"url" === victim && $"outcome" === "ok").count() >= 1,
      "un-blocked url was not crawled after uncrawlable delete")
  }

  test("a created source seeds the crawl; a soft-deleted one stops") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val store = new TableStore(spark, SparkTestBase.tempDir("mut-crawl"))
    val m = new Mutations(spark, store)
    val sched = new Scheduler(spark, store, CrawlConfig())
    // bootstrap pages only; the source catalog comes from the write path
    sched.bootstrap(Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      m.sources)
    m.createSource(Fixtures.FixtureHost, "127.0.0.1", "p-0", crawl = true, vtSec = 0)
    sched.run(maxWaves = 40)
    assert(sched.urlsView.filter($"last_get".isNotNull).count() >= 3,
      "created source did not drive the crawl")

    // a fresh store with the same catalog but the source soft-deleted
    val store2 = new TableStore(spark, SparkTestBase.tempDir("mut-crawl2"))
    val m2 = new Mutations(spark, store2)
    val sched2 = new Scheduler(spark, store2, CrawlConfig())
    sched2.bootstrap(Fixtures.pagesDF(spark, Fixtures.staticSitePages), m2.sources)
    m2.createSource(Fixtures.FixtureHost, "127.0.0.1", "p-0", crawl = true, vtSec = 0)
    m2.deleteSourceByUrl(Fixtures.FixtureHost)
    sched2.run(maxWaves = 5)
    assert(sched2.fetchLogView.count() == 0, "deleted source still seeded the crawl")
  }

  test("uncrawlables: a thin scheduler append from a FRESH session keeps the CRUD columns") {
    // regression: a new session whose first touch of the table is
    // markUncrawlable's (url, created) delta must not seed the store's
    // schema cache with only those two columns — later cached-schema reads
    // would null the committed name/email/comments, and the next CRUD
    // rewrite would destroy them permanently
    val dir = SparkTestBase.tempDir("mut-prime")
    val m1 = new Mutations(spark, new TableStore(spark, dir))
    m1.createUncrawlable("http://a.example/x", "Ada", "ada@example", "spam", vtSec = 1)

    val store2 = new TableStore(spark, dir) // fresh session: empty schema cache
    new Scheduler(spark, store2, CrawlConfig()).markUncrawlable("http://b.example/y")
    val m2 = new Mutations(spark, store2)
    val row = m2.uncrawlables.filter($"url" === "http://a.example/x").collect().head
    assert(row.getAs[String]("name") == "Ada",
      "thin append from a fresh session nulled committed columns")

    m2.deleteUncrawlable("http://b.example/y") // rewrite from the merged view
    val m3 = new Mutations(spark, new TableStore(spark, dir))
    val after = m3.uncrawlables.collect()
    assert(after.length == 1 && after.head.getAs[String]("name") == "Ada",
      "CRUD rewrite lost the committed columns")
  }
}
