package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl._
import graft.streaming.StreamingCrawl

/** The Structured-Streaming deployment must produce the exact same crawl
  * as the batch loop (foreachBatch wave == batch wave). */
class StreamingCrawlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming foreachBatch crawl matches batch crawl output") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // batch reference
    val storeB = new TableStore(spark, SparkTestBase.tempDir("stream-batch"))
    val schedB = new Scheduler(spark, storeB, CrawlConfig())
    schedB.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    schedB.run(maxWaves = 40)

    // streaming run
    val storeS = new TableStore(spark, SparkTestBase.tempDir("stream-live"))
    val schedS = new Scheduler(spark, storeS, CrawlConfig())
    schedS.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    val waves = StreamingCrawl.runUntilQuiescent(spark, storeS, CrawlConfig(),
      SparkTestBase.tempDir("stream-ckpt"))
    assert(waves > 0)

    def urls(s: Scheduler) =
      s.urlsView.selectExpr("concat(url,'|',status,'|',coalesce(title,''))")
        .as[String].collect().sorted.toSeq
    def log(s: Scheduler) =
      s.fetchLogView.selectExpr("concat(wave,'|',vt,'|',host,'|',lane,'|',url,'|',outcome)")
        .as[String].collect().sorted.toSeq

    assert(urls(schedS) == urls(schedB), "urls differ between streaming and batch")
    assert(log(schedS) == log(schedB), "crawl order differs between streaming and batch")
  }
}
