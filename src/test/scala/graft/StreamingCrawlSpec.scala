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

  test("mid-run query.stop() cancels the in-flight wave; resume is exact") {
    // The graceful-cancel contract (fetchbot Cancel discards its queue
    // immediately; the wave engine's equivalent): query.stop() may land
    // MID-WAVE, the uncommitted wave is cancelled work (commit-or-nothing
    // through the TableStore manifest), and a resumed crawl completes with
    // output identical to a never-interrupted run.
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val storeB = new TableStore(spark, SparkTestBase.tempDir("cancel-batch"))
    val schedB = new Scheduler(spark, storeB, CrawlConfig())
    schedB.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    schedB.run(maxWaves = 40)

    val storeS = new TableStore(spark, SparkTestBase.tempDir("cancel-live"))
    val schedS = new Scheduler(spark, storeS, CrawlConfig())
    schedS.bootstrap(
      Fixtures.pagesDF(spark, Fixtures.staticSitePages),
      Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
    val query = StreamingCrawl.start(spark, storeS, CrawlConfig(),
      SparkTestBase.tempDir("cancel-ckpt"))
    // wait for at least one committed wave, then kill without draining —
    // with a 100ms trigger the stop routinely lands inside a running wave
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (storeS.currentWave < 2 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(storeS.currentWave >= 2, "streaming crawl never committed a wave")
    try { query.stop(); query.awaitTermination(30000) }
    catch { case _: Throwable => () } // interrupted foreachBatch may surface
    val waveAtKill = storeS.currentWave

    // resume on the SAME store with a fresh scheduler (new process analog):
    // it must pick up from the last committed wave and finish the crawl
    val schedR = new Scheduler(spark, storeS, CrawlConfig())
    schedR.run(maxWaves = 40)
    assert(storeS.currentWave >= waveAtKill)

    def urls(s: Scheduler) =
      s.urlsView.selectExpr("concat(url,'|',status,'|',coalesce(title,''))")
        .as[String].collect().sorted.toSeq
    def log(s: Scheduler) =
      s.fetchLogView.selectExpr("concat(wave,'|',vt,'|',host,'|',lane,'|',url,'|',outcome)")
        .as[String].collect().sorted.toSeq
    assert(urls(schedR) == urls(schedB), "urls differ after mid-run cancel + resume")
    assert(log(schedR) == log(schedB), "crawl order differs after mid-run cancel + resume")
  }
}
