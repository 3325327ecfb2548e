package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl._

/** Opt-in staleness-priority frontier ordering (the north star's "per-host
  * priority queue (recrawl staleness score)"): each host's budgeted takes
  * run most-stale-first (prio_score desc, seq tiebreak) instead of FIFO.
  * Scores are frozen at enqueue time from columns the enqueue path already
  * holds, so the take stays O(budget) — no take-time scoring join. */
class StalenessPrioritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def queuedDF =
    // one host, 1s delay, 8s window → 8 takes; 12 queued commands whose
    // score order INVERTS their seq order
    (0 until 12).map(i =>
      (s"http://h0/p$i", "GET", "h0", "A", 0L, i.toLong, "queued", (i * 100).toLong))
      .toDF("url", "method", "host", "lane", "wave", "seq", "state", "prio_score")

  private def hostPlan =
    Seq(("h0", "A", false, "", 1.0, 0.0))
      .toDF("host", "lane", "robots_now", "eff_robots_txt", "eff_delay", "start_vt")

  test("priority mode takes most-stale-first; FIFO mode ignores the score") {
    val store = new TableStore(spark, SparkTestBase.tempDir("prio-budget"))
    val fifo = new Scheduler(spark, store, CrawlConfig())
      .politeBudget(queuedDF, hostPlan, waveEnd = 8.0, rankBound = 9)
      .collect().sortBy(_.getAs[Double]("vt")).map(_.getAs[Long]("seq")).toSeq
    assert(fifo == (0L to 7L), s"FIFO order broken: $fifo")

    val prio = new Scheduler(spark, store, CrawlConfig(stalenessPriority = true))
      .politeBudget(queuedDF, hostPlan, waveEnd = 8.0, rankBound = 9)
      .collect().sortBy(_.getAs[Double]("vt")).map(_.getAs[Long]("seq")).toSeq
    assert(prio == (11L to 4L by -1L), s"staleness order broken: $prio")
  }

  test("priority mode keeps the WindowGroupLimit prune (same bounded plan)") {
    val store = new TableStore(spark, SparkTestBase.tempDir("prio-plan"))
    val s = new Scheduler(spark, store, CrawlConfig(stalenessPriority = true))
    val b = s.politeBudget(queuedDF, hostPlan, waveEnd = 8.0, rankBound = 9)
    assert(b.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "priority ordering lost the rank prune below the exchange")
  }

  test("priority crawl reaches the same URL set as FIFO (order differs, coverage identical)") {
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    def crawl(cfg: CrawlConfig): Scheduler = {
      val store = new TableStore(spark, SparkTestBase.tempDir("prio-e2e"))
      val sched = new Scheduler(spark, store, cfg)
      sched.bootstrap(
        Fixtures.pagesDF(spark, Fixtures.staticSitePages),
        Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
      sched.run(maxWaves = 40)
      sched
    }
    val fifo = crawl(CrawlConfig())
    val prio = crawl(CrawlConfig(stalenessPriority = true))
    val fifoUrls = fifo.urlsView.select("url").as[String].collect().toSet
    val prioUrls = prio.urlsView.select("url").as[String].collect().toSet
    assert(prioUrls == fifoUrls)
    // determinism holds in priority mode too: a rerun is identical
    val prio2 = crawl(CrawlConfig(stalenessPriority = true))
    val order = (s: Scheduler) => s.fetchLogView
      .orderBy("wave", "vt", "host", "lane", "seq")
      .selectExpr("concat(wave,'|',vt,'|',url,'|',method)").as[String].collect().toSeq
    assert(order(prio) == order(prio2))
  }
}
