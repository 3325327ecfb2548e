package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.crawl.{CrawlConfig, Scheduler, TableStore}

/** Structured-Streaming deployment of the crawl scheduler (SURVEY §2.8).
  *
  * The wave loop is the foreachBatch body: a streaming source ticks the
  * micro-batches (here a rate source — in production the trigger cadence is
  * the politeness window), and each batch executes exactly one deterministic
  * wave against the snapshot-versioned state tables. Because every wave
  * commits atomically through the TableStore manifest, a streaming restart
  * resumes at the last committed wave with identical ordering — the same
  * guarantee the batch loop and crawler tests rely on (north rule
  * resumability), now driven by a StreamingQuery with checkpointing.
  *
  * This mirrors sentry's long-running daemon shape (`startCrawling` +
  * 30-min reseed ticker, /root/reference/crawler.go:36-156) while keeping
  * all work in the wave's DataFrame plan.
  */
object StreamingCrawl {

  /** Start the crawl as a streaming query; each micro-batch = one wave.
    * Stops itself (via caller) — use awaitQuiescence for bounded runs. */
  def start(spark: SparkSession, store: TableStore, cfg: CrawlConfig,
      checkpointDir: String, triggerMs: Long = 100L): StreamingQuery = {
    val sched = new Scheduler(spark, store, cfg)
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        val w = store.currentWave + 1
        sched.runWave(w)
        ()
      }
      .start()
  }

  /** Run the streaming crawl until the frontier drains N consecutive waves,
    * then stop. Returns the number of waves executed. */
  def runUntilQuiescent(spark: SparkSession, store: TableStore, cfg: CrawlConfig,
      checkpointDir: String, maxWaves: Int = 60): Long = {
    val sched = new Scheduler(spark, store, cfg)
    val query = start(spark, store, cfg, checkpointDir)
    val startWave = store.currentWave
    try {
      var done = false
      while (!done && store.currentWave - startWave < maxWaves) {
        Thread.sleep(200)
        if (store.currentWave > math.max(0, startWave + 1)) {
          val depth = sched.frontierDepth
          if (depth == 0) done = true
        }
      }
    } finally {
      query.stop()
      query.awaitTermination(30000)
    }
    store.currentWave - startWave
  }
}
