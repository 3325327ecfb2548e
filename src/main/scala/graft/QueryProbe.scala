package graft

import org.apache.spark.sql.SparkSession

/** Per-query timing diagnostic: run named catalog queries (or the fixture
  * crawl with arg `crawl_e2e`) with warmup + N timed runs, printing each
  * run — the tool for separating a real plan regression from box noise
  * (single-shot timings on this machine drift ±2x with hypervisor state).
  *
  * usage: runMain graft.QueryProbe <sfDir> <runs> <name> [<name> ...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      // match Bench's per-phase conf: the fixture crawl runs at toy-scale
      // shuffle parallelism with AQE coalescing on
      if (name == "crawl_e2e") {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
      } else {
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        if (name == "crawl_e2e") {
          val store = new crawl.TableStore(spark,
            java.nio.file.Files.createTempDirectory("probe-crawl").toString)
          val sched = new crawl.Scheduler(spark, store, crawl.CrawlConfig())
          sched.bootstrap(
            crawl.Fixtures.pagesDF(spark, crawl.Fixtures.staticSitePages),
            crawl.Fixtures.sourcesDF(spark, crawl.Fixtures.staticSiteSources))
          sched.run(maxWaves = 40)
        } else SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val times = (0 to runs).map { _ =>
        val t = once()
        // ContextCleaner reclaims shuffle/broadcast state only after a
        // driver GC — settle between runs so each starts clean (the same
        // treatment Bench applies to kernel iterations and the e2e crawl)
        System.gc(); Thread.sleep(1500)
        t
      } // run 0 = warmup
      println(f"$name%-24s warm=${times.head}%7.2fs timed=[${
        times.tail.map(t => f"$t%.2f").mkString(", ")}] min=${times.tail.min}%7.2fs")
    }
    spark.stop()
  }
}
