package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.crawl.Fixtures
import graft.functions.Funcs

/** Dedup-phase decomposition diagnostic (round 5): times the kernel's
  * extract_dedup_pass in cumulative slices, each in the SAME fresh-JVM,
  * regenerate-per-pass shape the Bench kernel uses, so the non-scaling
  * stage can be located precisely.
  *
  *   usage: runMain graft.PhaseDiag <master> <slice>
  *   slices: extract  — generate + UDF href extraction + explode + count
  *           hash     — + xxhash64 projection (no exchange)
  *           distinct — + hash distinct (the 8-byte exchange + 2-level agg)
  *           full     — + anti-join vs the bucket-clustered seen table
  */
object PhaseDiag {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val slice = args(1)
    val cfg = Fixtures.ScaleConfig(hosts = 2048, pagesPerHost = 512,
      outDegree = 16, partitions = 128)
    val b = SparkSession.builder().master(master)
      .appName(s"phase-diag")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
    // A/B knob: "k=v;k2=v2" extra confs (same syntax as GRAFT_BENCH_CONF)
    sys.env.get("GRAFT_DIAG_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1L << 20).toString)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if (slice == "full" || slice == "antifirst") {
      val buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val seenDir = java.nio.file.Files.createTempDirectory("diag-seen").toString
      Fixtures.scaleSiteUrls(spark, cfg).toDF("url")
        .select(xxhash64($"url").as("uh"), $"url")
        .write.mode("overwrite").format("parquet").bucketBy(buckets, "uh")
        .option("path", s"$seenDir/seen_urls").saveAsTable("seen_urls")
    }
    def links(c: Fixtures.ScaleConfig) =
      Fixtures.scaleSitePages(spark, c).toDF()
        .select(posexplode(Funcs.extractLinksUdf($"url", $"html")).as(Seq("i", "dst")))
    def run(c: Fixtures.ScaleConfig): Unit = slice match {
      case "extract" => links(c).count()
      case "hash" => links(c).select(xxhash64($"dst").as("uh"))
        .agg(count($"uh"), max($"uh")).head()
      case "distinct" => links(c).select(xxhash64($"dst").as("uh")).distinct().count()
      case "full" => links(c).select(xxhash64($"dst").as("uh")).distinct()
        .join(spark.table("seen_urls").select("uh").hint("shuffle_hash"),
          Seq("uh"), "left_anti").count()
      // anti-join FIRST, distinct after: same exchange bytes, but the 16M
      // probe rows skip the partial+final aggregate hash tables — the SHJ
      // streams them against the 32k-entry per-partition seen map and at
      // steady state emits ~nothing, so the trailing distinct is free
      case "antifirst" => links(c).select(xxhash64($"dst").as("uh"))
        .join(spark.table("seen_urls").select("uh").hint("shuffle_hash"),
          Seq("uh"), "left_anti").distinct().count()
    }
    run(cfg.copy(hosts = math.max(cfg.hosts / 16, 8))) // JIT warmup
    val times = (0 until 2).map { _ =>
      val t0 = System.nanoTime()
      run(cfg)
      val dt = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(3000)
      dt
    }
    println(f"PHASE $slice $master ${times.min}%.2f")
    spark.stop()
  }
}
