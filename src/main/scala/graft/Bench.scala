package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.crawl._
import graft.functions.Funcs

/** Round benchmark (driver contract): one JSON line on stdout.
  *
  * Headline metric: URLs fetched+deduped/sec through the steady-state wave
  * kernel — the parallel region of the crawl (offline fetch join → sniff →
  * title → href extraction/resolution → link dedup → URL-seen anti-join) on
  * a deterministic generated web graph. The identical kernel on identical
  * input runs at local[8] and local[32] (north rule: N vs 4N executors in
  * this single-node sandbox); scaling efficiency = (thr_4N / thr_N) / 4.
  *
  * The end-to-end fixture crawl and the SparkEntry operator catalog are also
  * timed at the round parallelism. Wave-commit overhead (parquet snapshot
  * writes, manifest swaps) is deliberately excluded from the kernel number:
  * at 10^10-url scale the parallel region dominates wall time, so kernel
  * throughput is the cluster-size predictor; end-to-end numbers are
  * reported alongside.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The steady-state wave kernel over a generated page table: everything a
    * fetch wave does between budget and commit. Returns urls processed. */
  private def waveKernel(spark: SparkSession, cfg: Fixtures.ScaleConfig): Long = {
    import spark.implicits._
    val pages = Fixtures.scaleSitePages(spark, cfg).toDF()

    // frontier = every page url (steady-state: the whole wave is GETs)
    val frontier = pages.select($"url", Funcs.hostUdf($"url").as("host"))

    // offline fetch + response handling (S6/P12/F5/F8/F9)
    val fetched = frontier.join(pages.select("url", "html"), Seq("url"))
      .withColumn("sniff", Funcs.sniffUdf($"html"))
      .withColumn("is_doc", $"sniff" === "text/html; charset=utf-8" ||
        $"sniff" === "text/plain; charset=utf-8")
      .withColumn("title", when($"is_doc", Funcs.titleUdf($"html")))
      .withColumn("body_hash", Funcs.multihash($"html"))

    val links = fetched.filter($"is_doc")
      .select($"url".as("src"),
        posexplode(Funcs.extractLinksUdf($"url", $"html")).as(Seq("idx", "dst")))

    // URL-seen dedup (J8): candidate dsts anti-joined vs the "seen" set
    val seen = frontier.select($"url")
    val newUrls = links.select($"dst".as("url")).distinct()
      .join(seen, Seq("url"), "left_anti")

    // force every computed column (a bare count would let Catalyst prune
    // sniff/title/hash away): aggregate over them like the wave writes do
    val row = fetched.agg(count(lit(1)), count($"title"),
      max(length($"body_hash")), count($"sniff")).head()
    val nFetched = row.getLong(0)
    newUrls.count()
    nFetched
  }

  private def timeKernel(cpus: Int, cfg: Fixtures.ScaleConfig): (Double, Long) = {
    val spark = session(cpus)
    try {
      // warmup: JIT + codegen caches on a small slice
      waveKernel(spark, cfg.copy(hosts = 8, pagesPerHost = 8))
      val t0 = System.nanoTime()
      val n = waveKernel(spark, cfg)
      ((System.nanoTime() - t0) / 1e9, n)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = sfDir.split("sf").last

    val scaleCfg = sf match {
      case "0.001" => Fixtures.ScaleConfig(hosts = 64, pagesPerHost = 32, outDegree = 12)
      case "0.01"  => Fixtures.ScaleConfig(hosts = 128, pagesPerHost = 64, outDegree = 12)
      case _       => Fixtures.ScaleConfig(hosts = 256, pagesPerHost = 128, outDegree = 16)
    }

    // ---- scaling evidence: identical kernel at N and 4N worker threads
    val (t8, n8) = timeKernel(8, scaleCfg)
    val (t32, n32) = timeKernel(32, scaleCfg)
    val thr8 = n8 / t8
    val thr32 = n32 / t32
    val efficiency = (thr32 / thr8) / 4.0

    // ---- per-query timings + end-to-end fixture crawl at round parallelism
    val spark = session(cpus)
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    try {
      // end-to-end crawl (includes commit overhead — reported separately)
      val crawlT0 = System.nanoTime()
      val store = new TableStore(spark,
        java.nio.file.Files.createTempDirectory("bench-crawl").toString)
      val sched = new Scheduler(spark, store, CrawlConfig())
      sched.bootstrap(
        Fixtures.pagesDF(spark, Fixtures.staticSitePages),
        Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
      sched.run(maxWaves = 40)
      timings += "crawl_fixture_e2e" -> (System.nanoTime() - crawlT0) / 1e9

      SparkEntry.queries.foreach { case (name, fn) =>
        if (!name.startsWith("crawl")) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case _: Throwable => () }
          timings += name -> (System.nanoTime() - t0) / 1e9
        }
      }
    } finally spark.stop()

    val qs = timings.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(
      f"""{"metric":"urls_fetched_deduped_per_sec","value":$thr32%.1f,"unit":"urls/sec","queries":$qs,"sf":"$sfDir","scaling":{"kernel_urls":$n32,"t_local8_sec":$t8%.2f,"t_local32_sec":$t32%.2f,"thr_local8":$thr8%.1f,"thr_local32":$thr32%.1f,"efficiency_n_to_4n":$efficiency%.3f}}""")
  }
}
