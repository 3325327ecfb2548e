package graft

/** Multi-draw 8→32-thread dedup-phase ceiling statistic (round-5 verdict
  * item #1): the committed single-draw `kernel_vs_ceiling_dedup` swings
  * ~±0.1-0.2 between JVM launches on this box, so a one-number claim is
  * not reproducible. This harness runs N INTERLEAVED draw triples —
  * kernel at local[8], kernel at local[32], no-Spark ThreadScaleProbe —
  * each in a fresh pinned JVM (the frozen `Bench kernel` / `ThreadScaleProbe`
  * mains are the subprocess entries, so the measured code is bit-identical
  * to the graded harness), and reports per-draw ratios plus min/median/max.
  *
  * Interleaving means slow machine phases hit kernel and probe alike
  * instead of biasing the ratio; per-draw pairing (kernel_i vs probe_i)
  * keeps each ratio same-session in the strictest sense.
  *
  * Kept OUTSIDE Bench.scala because the round freezes the graded harness;
  * the committed bench number stays a min-of-interleaved single statistic
  * and THIS artifact carries the spread. One JSON line on stdout:
  * {"draws":[{...}],"kernel_vs_ceiling_dedup":{"min":..,"median":..,"max":..},
  *  "kernel_vs_ceiling_map":{...}}
  *
  * usage: runMain graft.BenchExtra [nDraws (default 3)]
  */
object BenchExtra {

  private def settle(): Unit = {
    try new ProcessBuilder("sync").start().waitFor()
    catch { case _: Throwable => () }
    Thread.sleep(10000)
  }

  private def jvmBase: (String, String, Seq[String]) = {
    val javaHome = System.getProperty("java.home")
    val cp = System.getProperty("java.class.path")
    val passthrough = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
        a.startsWith("-D")).toSeq
    (javaHome, cp, passthrough)
  }

  private def run(cmd: Seq[String], prefix: String): Array[String] = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val proc = pb.start()
    val out = new StringBuilder
    val drain = new Thread(() => // a full stderr pipe would deadlock the child
      scala.io.Source.fromInputStream(proc.getErrorStream).getLines().foreach(_ => ()))
    drain.setDaemon(true); drain.start()
    scala.io.Source.fromInputStream(proc.getInputStream).getLines()
      .foreach { l => if (l.startsWith(prefix)) out.append(l) }
    proc.waitFor()
    require(out.nonEmpty, s"subprocess produced no '$prefix' line: ${cmd.takeRight(4)}")
    out.toString.stripPrefix(prefix).trim.split(" ")
  }

  /** One kernel measurement via the frozen `Bench kernel` main: returns
    * (map seconds, dedup seconds) of the best warm iteration. */
  private def kernel(master: String, cores: Int): (Double, Double) = {
    settle()
    val (javaHome, cp, passthrough) = jvmBase
    val cmd = Seq(s"$javaHome/bin/java", "-Xmx24g", "-XX:+UseParallelGC",
      s"-XX:ActiveProcessorCount=$cores") ++ passthrough ++ Seq("-cp", cp,
      "graft.Bench", "kernel", master, "2048", "512", "16", "128")
    val p = run(cmd, "KERNEL ")
    (p(2).toDouble, p(3).toDouble)
  }

  /** One no-Spark machine-ceiling probe: (map8, map32, shuffle8, shuffle32). */
  private def probe(): (Double, Double, Double, Double) = {
    settle()
    val (javaHome, cp, passthrough) = jvmBase
    val p = run(Seq(s"$javaHome/bin/java", "-Xmx16g") ++ passthrough ++
      Seq("-cp", cp, "graft.ThreadScaleProbe"), "PROBE ")
    (p(0).toDouble, p(1).toDouble, p(2).toDouble, p(3).toDouble)
  }

  /** WARC segment-source fan-out measurement (round-5 verdict item #6):
    * write N gzip segment files via WarcWriter (untimed — storage layout is
    * paid at archive time), then time (a) the full WarcReader scan, which
    * parallelizes one task per segment, at local[8] vs local[32], and
    * (b) `readIndexed` point-fetches of a bounded CDX sample (byte-range
    * reads). Artifact: bench_warc.json. usage: runMain graft.BenchExtra warc
    * [segments (256)] [recordsPerSegment (2000)] */
  private def warcFanout(args: Array[String]): Unit = {
    import org.apache.spark.sql.{functions => F}
    val segments = args.lift(1).map(_.toInt).getOrElse(256)
    val perSeg = args.lift(2).map(_.toInt).getOrElse(2000)
    val dir = java.nio.file.Files.createTempDirectory("warc-fanout").toString
    def session(cores: Int) = {
      val sp = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      sp.sparkContext.setLogLevel("ERROR"); sp
    }
    // ---- untimed setup: synthesize + write the segment corpus once
    val sW = session(32)
    val n = segments.toLong * perSeg
    val df = sW.range(n).select(
      F.concat(F.lit("http://h"), (F.col("id") % 4096).cast("string"),
        F.lit(".example.com/p/"), F.col("id").cast("string")).as("url"),
      F.lit("2026-01-01T00:00:00Z").as("date_iso"),
      F.concat(F.lit("<urn:uuid:"), F.col("id").cast("string"), F.lit(">")).as("record_id"),
      // ~2 KB deterministic body
      F.repeat(F.concat(F.lit("payload-"), F.col("id").cast("string"), F.lit(" ")), 128)
        .cast("binary").as("body"))
      .repartition(segments)
    val cdx = graft.sources.WarcWriter.writeSegments(df, dir)
    val cdxRows = cdx.count()
    // bounded fetch sample: 1024 hash-smallest cdx entries (deterministic)
    val sampleRows = cdx.orderBy(F.xxhash64(F.col("url")), F.col("url")).limit(1024)
      .collect().toSeq
    sW.stop()
    // ---- timed: full scan at 8 and 32 cores (fresh session each)
    def scanOnce(cores: Int): Double = {
      val sp = session(cores)
      try {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.sources.WarcReader.read(sp, dir)
            .agg(F.count(F.lit(1)), F.sum(F.length(F.col("body")))).head()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warmup
        math.min(once(), once())
      } finally sp.stop()
    }
    val t8 = scanOnce(8)
    val t32 = scanOnce(32)
    // ---- timed: indexed point fetches (byte-range reads; 32 cores)
    val sF = session(32)
    val tFetch = try {
      import sF.implicits._
      val idx = sampleRows.map(r => (r.url, r.warc_file, r.offset,
          r.length, r.record_id))
        .toDF("url", "warc_file", "offset", "length", "record_id")
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.sources.WarcWriter.readIndexed(idx)
          .agg(F.count(F.lit(1)), F.sum(F.length(F.col("body")))).head()
        (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once())
    } finally sF.stop()
    val eff = (t8 / t32) / 4.0
    val json = f"""{"warc_fanout":{"segments":$segments,"records":$n,"cdx_rows":$cdxRows,"t_scan_local8_sec":$t8%.2f,"t_scan_local32_sec":$t32%.2f,"scan_eff_8_to_32":$eff%.3f,"t_fetch_1024_sec":$tFetch%.2f}}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_warc.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("warc")) { warcFanout(args); return }
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val draws = (0 until n).map { i =>
      System.err.println(s"[benchextra] draw ${i + 1}/$n")
      val (m8, d8) = kernel("local[8]", 8)
      val (m32, d32) = kernel("local[32]", 32)
      val (pm8, pm32, ps8, ps32) = probe()
      val effMap = m8 / m32 / 4.0
      val effDedup = d8 / d32 / 4.0
      val ceilMap = pm8 / pm32 / 4.0
      val ceilShuffle = ps8 / ps32 / 4.0
      val rMap = effMap / ceilMap
      val rDedup = effDedup / ceilShuffle
      System.err.println(f"[benchextra] draw ${i + 1}: map $rMap%.3f dedup $rDedup%.3f " +
        f"(k8 $m8%.2f/$d8%.2f k32 $m32%.2f/$d32%.2f probe $pm8%.2f/$pm32%.2f/$ps8%.2f/$ps32%.2f)")
      (rMap, rDedup, m8, d8, m32, d32, pm8, pm32, ps8, ps32)
    }
    def stats(xs: Seq[Double]): (Double, Double, Double) = {
      val s = xs.sorted
      (s.head, s(s.size / 2), s.last)
    }
    val (mMin, mMed, mMax) = stats(draws.map(_._1))
    val (dMin, dMed, dMax) = stats(draws.map(_._2))
    val drawJson = draws.map { d =>
      f"""{"ratio_map":${d._1}%.3f,"ratio_dedup":${d._2}%.3f,"k8_map":${d._3}%.2f,"k8_dedup":${d._4}%.2f,"k32_map":${d._5}%.2f,"k32_dedup":${d._6}%.2f,"probe_map8":${d._7}%.2f,"probe_map32":${d._8}%.2f,"probe_shuffle8":${d._9}%.2f,"probe_shuffle32":${d._10}%.2f}"""
    }.mkString("[", ",", "]")
    val json =
      f"""{"draws":$drawJson,"kernel_vs_ceiling_map":{"min":$mMin%.3f,"median":$mMed%.3f,"max":$mMax%.3f},"kernel_vs_ceiling_dedup":{"min":$dMin%.3f,"median":$dMed%.3f,"max":$dMax%.3f}}"""
    println(json)
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_extra.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
  }
}
