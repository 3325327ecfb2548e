package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.functions.{Funcs, GoUrl}

/** Crawl configuration — reference defaults cited in BASELINE.md. */
final case class CrawlConfig(
    agent: String = "Fetchbot (https://github.com/PuerkitoBio/fetchbot)", // fetch.go:43-44
    crawlDelaySec: Double = 1.0, // cfg.CrawlDelaySeconds (config.go:52-56); lib default 5s
    polite: Boolean = true,      // robots respected unless Polite=false (crawler.go:123)
    staleDurationSec: Long = 72L * 3600, // StaleDuration 72h hardcoded (config.go:97-100)
    waveWindowSec: Double = 8.0, // virtual politeness window per wave
    seedSourcesLimit: Int = 200, // crawler.go:139
    seedUrlsInit: Int = 10,      // crawler.go:140
    seedUrlsRefill: Int = 400,   // crawler.go:150
    lowWatermark: Int = 100,     // crawler.go:147
    quiescent: Boolean = true,   // gate re-seeds on staleness so batch runs terminate
    /** Order each host's takes by recrawl staleness score (most-stale
      * first, seq tiebreak) instead of pure FIFO — the priority-queue mode
      * of the north star. Off by default: the reference's fetchbot queues
      * are FIFO and the golden crawl-order oracles pin that ordering. */
    stalenessPriority: Boolean = false,
    useBloomPrefilter: Boolean = true, // A9: bloom URL-seen prefilter ahead of the exact anti-join
    bloomExpectedItems: Long = 1L << 20,
    bloomFpp: Double = 0.01,
    bloomShards: Int = 8,   // per-shard Bloom files; never one driver-held filter
    urlBuckets: Int = 16,   // urls table hash-bucket partitioning (O(delta) waves)
    compactEvery: Int = 8)

/** The crawl scheduler: sentry's three-fetcher pipeline
  * (/root/reference/crawler.go:36-156, content_crawler.go, seed_crawler.go +
  * vendor/github.com/PuerkitoBio/fetchbot/fetch.go) re-expressed as a
  * deterministic batch loop of DataFrame transformations — the foreachBatch
  * body of a Structured-Streaming deployment (SURVEY §3.1).
  *
  * One wave = one virtual politeness window:
  *   seed (T7 thresholds 200/10/400/100) → enqueue-dedup (J8 anti-join vs
  *   frontier) → per-host budget (T4 politeness, T3 FIFO by seq) → robots
  *   gate (P8) → offline fetch (join vs the page table, S6) → response
  *   handlers (GET/HEAD mux P12; link extraction F9; url/link/snapshot
  *   writes T9) → next-wave enqueues → atomic multi-table commit + lineage
  *   (T10).
  *
  * Time is virtual (vt = seconds since Model epoch): politeness is enforced
  * by budgeted takes — a host executes at most floor(window/delay) commands
  * per wave at vt spacing >= its effective delay — instead of sleeping in
  * executors. That yields a deterministic, parallelism-independent schedule
  * (the north rule's exact-match property holds at local[8] and local[32]
  * alike). Deliberate, documented determinism deviations from the reference
  * (which stamps wall-clock time, random uuids, and random Go-map header
  * order): deterministic sha-derived ids, fixed header k/v order, and
  * set-semantics enqueue (sentry's 30-min reseed tick can transiently
  * double-enqueue; final membership is identical).
  *
  * Scale notes (10^10-url frontier): every join/agg below keys on `url` or
  * `(host, lane)`; the frontier and urls tables are the only large state and
  * both are append/MOR parquet (Iceberg-shaped). Small sides (whitelist,
  * host plan, robots) broadcast. Per-host FIFO needs only a per-host window
  * over the *budgeted* rows (bounded by window/delay per host), never a
  * global sort. Mega-host skew is bounded by the politeness budget itself —
  * a host can contribute at most floor(window/delay) rows per wave — so the
  * fetch stage is skew-immune by construction; the enqueue anti-joins rely
  * on AQE skew handling.
  */
/** Static query shapes shared by the wave loop and its plan-shape specs. */
object Scheduler {

  /** J8 URL-seen probe, hash-exchange form (the round-5 bench kernel's plan,
    * promoted to the production enqueue path WITH the exact string-confirm
    * leg the kernel documents):
    *
    *   1. anti-join candidate dsts against xxhash64(url) of the seen slice —
    *      the table side of the exchange carries 8-BYTE LONGS, not ~60-byte
    *      url strings (guide §2.3: shuffle keys, not payloads). A hash
    *      absent from the table is DEFINITELY novel (no false negatives).
    *   2. candidates whose hash IS present are confirmed against strings —
    *      but only against the O(matched) seen rows sharing a candidate
    *      hash (semi-join by hash first), so the string exchange is
    *      O(maybe-seen), never O(table slice). A 64-bit collision therefore
    *      costs a few confirm rows, never a lost url.
    *
    * Returns exactly the `cand` rows whose `dst` does not appear in
    * `seen`'s `url` column — set-identical to
    * `cand.join(seen.withColumnRenamed("url","dst"), Seq("dst"),
    * "left_anti")`, with all other `cand` columns carried through. */
  private[graft] def hashProbeNewUrls(cand: DataFrame, seen: DataFrame): DataFrame = {
    val c = cand.withColumn("uh_", xxhash64(col("dst")))
    val sh = seen.select(xxhash64(col("url")).as("uh_"), col("url"))
    val hashNovel = c.join(sh.select("uh_"), Seq("uh_"), "left_anti")
    val maybe = c.join(sh.select("uh_"), Seq("uh_"), "left_semi")
    val hitSeen = sh.join(c.select("uh_"), Seq("uh_"), "left_semi")
    val collidedNovel = maybe
      .join(hitSeen.select(col("url").as("dst")), Seq("dst"), "left_anti")
    hashNovel.unionByName(collidedNovel)
      .select(cand.columns.map(col): _*)
  }
}

final class Scheduler(spark: SparkSession, store: TableStore, cfg: CrawlConfig) {

  /** Live seen-bloom shard dir as of this instance's last committed wave —
    * the wave loop's fast path around re-reading the one-row
    * seen_bloom_meta table (see runWave's bloomDir resolution). */
  @volatile private var bloomDirCache: Option[String] = None
  import spark.implicits._
  import Model._

  private val SeqStride = 1L << 32
  private val EnqueueOffset = 1L << 24 // response-derived enqueues sort after next wave's seeds
  private val baseEpochSec: Long = Model.VirtualEpoch.getTime / 1000L

  /** Concurrent job submission for a wave's INDEPENDENT actions (the staged
    * table writes, the final materializations, the stat counts). A wave is
    * dominated by driver-side job latency, not compute — each action is one
    * round trip through the scheduler — so independent actions submit from
    * a small thread pool (the standard Spark multi-job driver pattern;
    * shared persisted frames are safe, the BlockManager serializes
    * first-computation per block). Failures propagate: any action throwing
    * fails the wave before commitWave publishes. */
  private val waveExec = java.util.concurrent.Executors.newFixedThreadPool(12,
    (r: Runnable) => { val t = new Thread(r, "wave-par"); t.setDaemon(true); t })

  private def par[T](thunks: Seq[() => T]): Seq[T] = {
    import scala.jdk.CollectionConverters._
    val futures = waveExec.invokeAll(
      thunks.map(t => new java.util.concurrent.Callable[T] { def call(): T = t() }).asJava)
    futures.asScala.map(_.get()).toSeq // get() rethrows the first failure
  }

  private def vtTs(vtCol: Column): Column = timestamp_seconds(lit(baseEpochSec) + floor(vtCol))

  private val robotsDelayUdf = udf { (txt: String, agent: String) =>
    if (txt == null || txt.isEmpty) null
    else RobotsCache.get(txt).crawlDelay(agent).map(Double.box).orNull
  }
  private val robotsAllowUdf = udf { (txt: String, path: String, agent: String) =>
    if (txt == null || txt.isEmpty) true
    else RobotsCache.get(txt).testAgent(if (path == null || path.isEmpty) "/" else path, agent)
  }
  /** Source.AsUrl: prepend http:// and round-trip the parser (source.go:123-147). */
  private val asUrlUdf = udf { (src: String) =>
    GoUrl.parse("http://" + src).map(_.serialize).toOption.orNull
  }

  // -------------------------------------------------------------- table views

  private def emptyDF[T <: Product : org.apache.spark.sql.Encoder]: DataFrame =
    spark.emptyDataset[T].toDF()

  /** Per-instance cached empty frames: deriving a Product ExpressionEncoder
    * is runtime reflection (hundreds of ms) and the wave loop needs these
    * constants every wave — pay the derivation once, not once per wave. */
  private lazy val emptyFrontierDF: DataFrame = emptyDF[FrontierRow]
  private lazy val emptyHostStateDF: DataFrame = emptyDF[HostStateRow]

  /** frontier merge-on-read view: latest (f_wave, f_prio) transition per
    * url wins; urls whose latest transition is `taken` have left the queue.
    * Same layout as the urls table — waves APPEND O(delta) transition rows
    * (seeds, takes, blocks, enqueues) and never rewrite the backlog; a
    * pre-MOR snapshot (single rewrite version, no f_wave column) reads as
    * wave-0 transitions, so resume from an old store keeps working.
    *
    * Read discipline (the round-3 read-amplification fix): a wave evaluates
    * this view EXACTLY ONCE — `runWave` localCheckpoints it into
    * `frontier0` and every in-wave consumer (queue gauge, budget slice,
    * active-url set, seed anti-join) reads the checkpointed frame, so the
    * transition log is scanned and latest-wins-shuffled once per wave, not
    * once per consumer. Point lookups (`seedUrl`, `markUncrawlable`) never
    * touch the full view: latest-wins-per-url commutes with a url filter,
    * so `frontierRowsFor` filters the log down to one `fbucket` (files are
    * clustered on it at write time — parquet stats skip the rest) BEFORE
    * the window. */
  private def frontierDF: DataFrame = frontierMorView(None)

  /** Frontier-log schema backfill: pre-MOR files get wave-0 stamps,
    * pre-bucketing files get their fbucket recomputed from the url,
    * pre-priority logs score 0 (same read-side migration policy as the
    * urls `ubucket`). Shared by the live view and time travel. */
  private def frontierBackfill(df0raw: DataFrame): DataFrame = {
    val stamped =
      if (df0raw.columns.contains("f_wave"))
        df0raw.withColumn("f_wave", coalesce($"f_wave", lit(0L)))
          .withColumn("f_prio", coalesce($"f_prio", lit(0)))
      else df0raw.withColumn("f_wave", lit(0L)).withColumn("f_prio", lit(0))
    val bucketed =
      if (stamped.columns.contains("fbucket"))
        stamped.withColumn("fbucket", coalesce($"fbucket", bucketCol($"url")))
      else stamped.withColumn("fbucket", bucketCol($"url"))
    if (bucketed.columns.contains("prio_score"))
      bucketed.withColumn("prio_score", coalesce($"prio_score", lit(0L)))
    else bucketed.withColumn("prio_score", lit(0L))
  }

  /** Latest-wins MOR collapse of a (backfilled) frontier transition log —
    * the ONE place the frontier's ordering contract lives. */
  private def frontierLatestWins(log: DataFrame): DataFrame = {
    val w = Window.partitionBy("url").orderBy(desc("f_wave"), desc("f_prio"))
    log.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1)
      .drop("rn_", "f_wave", "f_prio", "fbucket")
      .filter($"state" =!= StateTaken)
  }

  private def frontierLog: Option[DataFrame] =
    store.readAppendOnly("frontier").map(frontierBackfill)

  private def frontierMorView(onlyUrl: Option[String]): DataFrame =
    frontierLog match {
      case None => emptyFrontierDF
      case Some(log) =>
        val df0 = onlyUrl match {
          case Some(u) =>
            log.filter($"fbucket" === urlBucketOf(u) && $"url" === u)
          case None => log
        }
        frontierLatestWins(df0)
    }

  /** Live frontier rows for one url — a bucket-pruned point read of the
    * transition log (the filter commutes with latest-wins-per-url). */
  private def frontierRowsFor(url: String): DataFrame =
    frontierMorView(Some(url))

  /** xxhash64 bucket of one url, computed driver-side by EVALUATING the
    * same Catalyst expression `bucketCol` builds (XxHash64 seed 42 +
    * floor-mod) — no Spark job. The old spelling ran a 1-row job per
    * admin point-lookup, which put a full scheduler round-trip in the
    * seedUrl/markUncrawlable hot path; expression eval is identical by
    * construction (it IS the executor-side code path) and parity is
    * additionally pinned by MutationsSpec/ApiCrawlSpec reading back
    * through the bucket-pruned views. */
  private def urlBucketOf(url: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64, Cast}
    import org.apache.spark.sql.types.IntegerType
    val h = XxHash64(Seq(Literal.create(url,
      org.apache.spark.sql.types.StringType)), 42L)
    val b = Cast(Pmod(h, Literal.create(cfg.urlBuckets.toLong,
      org.apache.spark.sql.types.LongType)), IntegerType)
    b.eval(null).asInstanceOf[Int]
  }

  /** Frontier transition priorities within one wave: a seed can be taken in
    * its own wave; a taken HEAD can be blocked; an eviction wins over all. */
  private val PrioSeed = 1
  private val PrioTaken = 2
  private val PrioBlocked = 3
  private val PrioEnqueued = 4
  private val PrioEvicted = 5

  /** Never-fetched / must-refetch staleness score: outranks any real age. */
  private val NeverFetchedScore = Long.MaxValue / 2

  private def withFrontierMor(df: DataFrame, w: Long, prio: Int): DataFrame =
    df.select("url", "method", "host", "lane", "wave", "seq", "state", "prio_score")
      .withColumn("f_wave", lit(w)).withColumn("f_prio", lit(prio))
      .withColumn("fbucket", bucketCol(col("url")))

  /** host_state MOR view: latest transition per (host, lane) wins. Waves
    * append only the hosts they touched (bounded by the politeness budget),
    * never the full host catalog — at 10^7+ hosts the old per-wave rewrite
    * was the last O(catalog) write. Pre-MOR snapshots read as wave 0. */
  private def hostStateDF: DataFrame =
    store.readAppendOnly("host_state") match {
      case None => emptyHostStateDF
      case Some(df0raw) =>
        val df0 =
          if (df0raw.columns.contains("h_wave"))
            df0raw.withColumn("h_wave", coalesce($"h_wave", lit(0L)))
          else df0raw.withColumn("h_wave", lit(0L))
        val w = Window.partitionBy("host", "lane").orderBy(desc("h_wave"))
        df0.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1)
          .drop("rn_", "h_wave")
    }

  /** urls hash bucket (partition column of the urls table). */
  private def bucketCol(c: Column): Column =
    pmod(xxhash64(c), lit(cfg.urlBuckets)).cast("int")

  /** urls merge-on-read view: latest (wave, prio) row per url wins. */
  def urlsView: DataFrame = urlsViewBuckets(None)

  /** Bucket-pruned MOR view: with `buckets` set, the filter on the
    * partition column prunes the parquet scan to just those directories
    * (Iceberg bucket-partition pruning equivalent) BEFORE the dedup window —
    * a wave that touches k urls reads O(k/B * table) rows, not O(table). */
  def urlsViewBuckets(buckets: Option[Seq[Int]]): DataFrame =
    urlsMorOver(store.readAppendOnly("urls"), buckets)

  /** Time travel (Iceberg VERSION AS OF): the urls MOR view exactly as
    * committed at `wave` — the same latest-wins read code over the
    * historical manifest's version list. None if `wave` was never
    * committed or predates the snapshot log. */
  def urlsViewAsOf(wave: Long): Option[DataFrame] =
    store.asOf(wave).map(s => urlsMorOver(s.readAppendOnly("urls"), None))

  /** Incremental CDC read (Iceberg incremental-scan shape): every url whose
    * CURRENT merge-on-read row was written after `sinceWave` — exactly the
    * rows a downstream consumer checkpointed at `sinceWave` must reprocess.
    * Returns the live row plus `changed_wave` (the stamp that superseded
    * the consumer's view).
    *
    * Scale shape: the delta's BUCKETS are discovered first by a
    * stamp-filtered scan (the `w_wave > since` predicate pushes into the
    * parquet scan, and version dirs written before `since` are skipped
    * whole via their max(w_wave) footer stats); the latest-wins window
    * then runs only over those buckets' files (the steady-state wave
    * treatment), so a small delta reads O(delta/B · log) rows — never a
    * full-table window. Falls back to the full view naturally when the
    * delta touches every bucket. The ≤`urlBuckets` collected ids mirror
    * the wave loop's bucket collect. */
  def urlsChangedSince(sinceWave: Long): DataFrame = {
    store.readAppendOnly("urls") match {
      case None => emptyDF[UrlRow].withColumn("changed_wave", lit(0L)).limit(0)
      case Some(raw) =>
        val df0 =
          if (raw.columns.contains("ubucket"))
            raw.withColumn("ubucket", coalesce($"ubucket", bucketCol($"url")))
          else raw.withColumn("ubucket", bucketCol($"url"))
        val touched = df0.filter($"w_wave" > sinceWave)
          .select($"ubucket").distinct().collect().map(_.getInt(0)).toSeq
        if (touched.isEmpty)
          emptyDF[UrlRow].withColumn("changed_wave", lit(0L)).limit(0)
        else {
          val slice = df0.filter($"ubucket".isin(touched: _*))
          val w = Window.partitionBy("url").orderBy(desc("w_wave"), desc("w_prio"))
          slice.withColumn("rn_", row_number().over(w))
            .filter($"rn_" === 1 && $"w_wave" > sinceWave)
            .withColumn("changed_wave", $"w_wave")
            .drop("rn_", "w_wave", "w_prio", "ubucket")
        }
    }
  }

  /** Frontier CDC — the queue-side twin of [[urlsChangedSince]]: every url
    * whose latest queue TRANSITION is stamped after `sinceWave`, carrying
    * the winning transition's `state` (INCLUDING `taken` evictions — a
    * consumer mirroring the queue needs removals, which the live
    * `frontierView` filters out) and `changed_wave`. Same bucket-discovery
    * + pruned latest-wins shape: O(delta/B · log) read for a small delta. */
  def frontierChangedSince(sinceWave: Long): DataFrame =
    frontierLog match {
      case None =>
        emptyDF[FrontierRow].withColumn("changed_wave", lit(0L)).limit(0)
      case Some(log) =>
        val touched = log.filter($"f_wave" > sinceWave)
          .select($"fbucket").distinct().collect().map(_.getInt(0)).toSeq
        if (touched.isEmpty)
          emptyDF[FrontierRow].withColumn("changed_wave", lit(0L)).limit(0)
        else {
          val slice = log.filter($"fbucket".isin(touched: _*))
          val w = Window.partitionBy("url").orderBy(desc("f_wave"), desc("f_prio"))
          slice.withColumn("rn_", row_number().over(w))
            .filter($"rn_" === 1 && $"f_wave" > sinceWave)
            .withColumn("changed_wave", $"f_wave")
            .drop("rn_", "f_wave", "f_prio", "fbucket")
        }
    }

  /** The committed frontier as of `wave` (time travel over the transition
    * log: latest-wins re-runs on the historical prefix, so the result is
    * the exact queue the scheduler saw after that wave's commit). */
  def frontierViewAsOf(wave: Long): Option[DataFrame] =
    store.asOf(wave).map { s =>
      s.readAppendOnly("frontier") match {
        case None => emptyFrontierDF
        case Some(raw) => frontierLatestWins(frontierBackfill(raw))
      }
    }

  private def urlsMorOver(src: Option[DataFrame],
      buckets: Option[Seq[Int]]): DataFrame =
    src match {
      case None => emptyDF[UrlRow]
      case Some(df0raw) =>
        // schema backfill on read: url deltas written before the bucketed
        // layout have no ubucket column (or parquet schema union reads their
        // rows as null) — recompute from the url so a resume from a
        // pre-bucketing snapshot neither fails resolution nor silently
        // drops pre-upgrade urls from bucket-pruned steady-state waves
        val df0 =
          if (df0raw.columns.contains("ubucket"))
            df0raw.withColumn("ubucket", coalesce($"ubucket", bucketCol($"url")))
          else df0raw.withColumn("ubucket", bucketCol($"url"))
        val df = buckets match {
          case Some(bs) => df0.filter($"ubucket".isin(bs: _*))
          case None     => df0
        }
        val w = Window.partitionBy("url").orderBy(desc("w_wave"), desc("w_prio"))
        df.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1)
          .drop("rn_", "w_wave", "w_prio", "ubucket")
    }

  /** links view: first (src,dst) row wins (Read-or-Insert, link.go:47-79). */
  def linksView: DataFrame =
    store.readAppendOnly("links").getOrElse(emptyDF[LinkRow])

  def snapshotsView: DataFrame =
    store.readAppendOnly("snapshots").getOrElse(emptyDF[SnapshotRow])
  def fetchLogView: DataFrame =
    store.readAppendOnly("fetch_log").getOrElse(emptyDF[FetchLogRow])
  def lineageView: DataFrame =
    store.readAppendOnly("lineage").getOrElse(emptyDF[LineageRow])
  /** The manual don't-crawl list (core/queries.go:729-751). */
  def uncrawlablesView: DataFrame =
    store.readAppendOnly("uncrawlables")
      .getOrElse(Seq.empty[(String, java.sql.Timestamp)].toDF("url", "created"))
  def pagesDF: DataFrame = store.readLatest("pages").get
  /** sources catalog; pre-soft-delete snapshots are read as deleted=false
    * (schema backfill on read, same policy as the urls ubucket migration). */
  def sourcesDF: DataFrame = {
    val df = store.readLatest("sources").get
    if (df.columns.contains("deleted")) df
    else df.withColumn("deleted", lit(false))
  }

  // -------------------------------------------------------------- bootstrap

  def bootstrap(pages: DataFrame, sources: DataFrame): Unit = {
    store.stageRewrite("pages", pages)
    store.stageRewrite("sources", sources)
    store.commitWave(-1L)
  }

  // -------------------------------------------------------------- one wave

  final case class WaveStats(wave: Long, taken: Long, fetchedOk: Long,
      enqueued: Long, frontierDepth: Long, urlsRead: Long = 0L)

  private def perShardItems: Long =
    math.max(64L, cfg.bloomExpectedItems / cfg.bloomShards)

  def runWave(w: Long): WaveStats = {
    store.resetPending()
    // phase marks (diagnostic, GRAFT_WAVE_DEBUG): driver-latency profile of
    // one wave — each mark is the wall time since the previous eager point
    val waveDebug = sys.env.contains("GRAFT_WAVE_DEBUG")
    var lastMarkNs = System.nanoTime()
    def mark(label: String): Unit = if (waveDebug) {
      val now = System.nanoTime()
      System.err.println(f"[wavephase] $w $label ${(now - lastMarkNs) / 1e9}%.2fs")
      lastMarkNs = now
    }
    // persistent-RDD watermark: everything this wave persists or
    // localCheckpoints below is freed at wave end. DataFrame.unpersist()
    // covers the persist() frames but NOT localCheckpoint blocks (they live
    // as plain RDD blocks outside the CacheManager and otherwise wait for a
    // driver GC + ContextCleaner pass — on a large driver heap that can be
    // never, and the blocks accumulate across waves and runs: measured as a
    // 3x wall-time drift over three back-to-back fixture crawls in one JVM)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val waveStart = w * cfg.waveWindowSec
    val waveEnd = (w + 1) * cfg.waveWindowSec
    val nowSec = baseEpochSec + waveStart.toLong
    val nowTs = timestamp_seconds(lit(nowSec))
    val staleBefore = nowSec - cfg.staleDurationSec

    // ONE frontier-log scan + latest-wins shuffle per wave: the MOR view is
    // materialized here and every consumer below (queue gauge, budget slice,
    // seed anti-join, active-url set) reads the checkpointed frame. Without
    // this each consumer's action re-ran the full-log window — ×3 full
    // shuffles per wave at a 10^10-row backlog (round-3 finding #1).
    val frontier0 = frontierDF.localCheckpoint()
    val uncrawl0 = uncrawlablesView.select("url")
    val hostState0 = hostStateDF

    // URL-seen sharded bloom (A9): the committed shard-file dir; a resume
    // from a pre-bloom snapshot rebuilds shards from the urls table — the
    // documented restart path (SURVEY §7.4.6). The driver never holds a
    // filter object — shards live as files, loaded lazily per executor.
    // The persisted geometry (shards, per-shard items, fpp) is validated
    // against cfg: probing with mismatched parameters hashes urls to the
    // wrong shard / wrong bit positions — silent false negatives that
    // re-create seen urls — so a mismatch (e.g. GRAFT_SHARDS changed
    // between runs) forces a rebuild from the urls table instead.
    def rebuildBloom(): Option[String] = {
      val dir = s"${store.rootPath}/seen_bloom/rebuild-v$w"
      ShardedBloom.buildToDir(spark, urlsView.select("url"), "url",
        cfg.bloomShards, perShardItems, cfg.bloomFpp, dir)
      Some(dir)
    }
    val bloomDir: Option[String] =
      if (!cfg.useBloomPrefilter) None
      // fast path: the dir this instance's PREVIOUS wave published (and
      // whose geometry is cfg's own by construction). Nothing else writes
      // seen_bloom_meta — seedUrl/markUncrawlable/compactTables don't touch
      // it — so re-reading the one-row manifest table (a parquet open + a
      // head() job) every wave only re-derived this field. A fresh instance
      // (resume) still takes the validated read below.
      else if (bloomDirCache.exists(d =>
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))))
        bloomDirCache
      else store.readLatest("seen_bloom_meta") match {
        case Some(df) =>
          val cols = df.columns.toSet
          val row = df.head()
          val geometryOk =
            cols.contains("shards") && row.getAs[Int]("shards") == cfg.bloomShards &&
            cols.contains("per_shard_items") &&
              row.getAs[Long]("per_shard_items") == perShardItems &&
            cols.contains("fpp") && row.getAs[Double]("fpp") == cfg.bloomFpp
          // dir existence: a resume from an old snapshot may reference a
          // shard dir that post-commit pruning has since deleted — rebuild
          // from the urls table (the same path a pre-bloom snapshot takes)
          val dirOk = geometryOk && java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(row.getAs[String]("dir")))
          if (dirOk) Some(row.getAs[String]("dir")) else rebuildBloom()
        case None if store.exists("urls") => rebuildBloom()
        case None => None
      }
    mark("bloom_meta")
    val queuedCount = frontier0.filter($"state" === StateQueued).count() // A10 gauge
    mark("frontier_ck+gauge")

    // ---- 1. seeding (crawler.go:139-153)
    val doSeed = w == 0 || queuedCount < cfg.lowWatermark
    val seedUrlCount = if (w == 0) cfg.seedUrlsInit else cfg.seedUrlsRefill
    // Full urls MOR view only on seed waves (seeding scans table-wide for
    // unfetched whitelisted urls); steady-state waves read only the hash
    // buckets their keys touch (see urlsWave below). localCheckpoint
    // truncates the logical plan: the reused intermediates otherwise re-nest
    // (urlsEff appears 4x inside urlsAfter), exploding plan size.
    val urlsSeedFull: DataFrame = if (doSeed) urlsView.localCheckpoint() else null

    val (seedRows, seedCreates, whitelist) = if (doSeed) {
      // qSourcesCrawling (queries.go:455-464): crawl=true AND deleted=false,
      // order by created desc limit 200 (soft-deleted sources never seed, P9)
      val srcSeeds = sourcesDF
        .filter($"crawl" === true && !coalesce($"deleted", lit(false)))
        .orderBy(desc("created"), asc("url")).limit(cfg.seedSourcesLimit)
        .select(asUrlUdf($"url").as("s_url"),
          row_number().over(Window.orderBy(desc("created"), asc("url"))).as("ord"))
        .filter($"s_url".isNotNull)
        .withColumn("kind", lit(0))

      val wl = srcSeeds.select(Funcs.hostUdf($"s_url").as("host")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      wl.count()

      // quiescent mode gates source re-seeds on GET staleness so batch runs
      // terminate (sentry re-fetches roots unconditionally forever, T7)
      val srcSeedsGated =
        if (cfg.quiescent && w > 0)
          srcSeeds.join(
            urlsSeedFull.filter($"last_get".isNotNull &&
              unix_timestamp($"last_get") >= staleBefore).select($"url".as("s_url")),
            Seq("s_url"), "left_anti")
        else srcSeeds

      // seedUrls (crawler.go:211-234): whitelisted unfetched, created desc
      val unfetched = urlsSeedFull.filter($"last_get".isNull)
        .withColumn("host", Funcs.hostUdf($"url"))
        .join(wl, Seq("host"), "left_semi")
        .orderBy(desc("created"), asc("url")).limit(seedUrlCount)
        .select($"url".as("s_url"),
          row_number().over(Window.orderBy(desc("created"), asc("url"))).as("ord"))
        .withColumn("kind", lit(1))

      val allSeeds = srcSeedsGated.unionByName(unfetched)
        .withColumn("rn_", row_number().over(Window.partitionBy($"s_url").orderBy($"kind", $"ord")))
        .filter($"rn_" === 1)
        // uncrawlables gate: manually-blocked urls never enter the frontier
        .join(broadcast(uncrawl0.select($"url".as("s_url"))),
          Seq("s_url"), "left_anti")
        .join(frontier0.select($"url".as("s_url")), Seq("s_url"), "left_anti") // enqued map
        .withColumn("seq", lit(w * SeqStride) +
          row_number().over(Window.orderBy($"kind", $"ord")).cast("long"))
        .select($"s_url".as("url"), lit("GET").as("method"),
          Funcs.hostUdf($"s_url").as("host"), lit("A").as("lane"),
          lit(w).as("wave"), $"seq", lit(StateQueued).as("state"),
          // seeds are stale-by-construction (unfetched, or past the
          // staleness gate that quiescent mode applies) → max score
          lit(NeverFetchedScore).as("prio_score"))

      // AsUrl Read-or-Save: unseen source roots become url rows
      val creates = srcSeedsGated.select($"s_url".as("url")).distinct()
        .join(urlsSeedFull.select("url"), Seq("url"), "left_anti")
        .select(newUrlRowCols($"url", nowTs): _*)

      (allSeeds, creates, wl)
    } else {
      val wl = store.readLatest("whitelist").getOrElse(Seq.empty[String].toDF("host"))
      (emptyFrontierDF, emptyUrlRows, wl)
    }

    // seeds are O(seed caps) rows; checkpoint truncates their lineage into
    // the wave (the full-frontier materialization this replaces was the
    // last O(state-size) write of the loop)
    val seedRowsCk = if (doSeed) seedRows.localCheckpoint() else seedRows
    mark("seeding")

    // ---- 2. politeness budget + robots plan (T4/T5)
    // queued commands visible to this wave = committed queued transitions
    // (MOR view) + this wave's seeds (already anti-joined vs the frontier)
    val queued = frontier0.filter($"state" === StateQueued).unionByName(seedRowsCk)
    val pages = pagesDF

    // one aggregation pass over the backlog yields depth AND the per-host
    // queue head (first_url) — the only two per-host facts a wave needs
    val hostsInPlay = queued.groupBy($"host", $"lane")
      .agg(count(lit(1)).as("qdepth"), min_by($"url", $"seq").as("first_url"))
      .join(hostState0, Seq("host", "lane"), "left")
      .withColumn("robots_fetched", coalesce($"robots_fetched", lit(false)))
      .withColumn("start_vt",
        greatest(coalesce($"next_fetch_vt", lit(waveStart)), lit(waveStart)))

    // first sight of a host prepends its robots.txt fetch (fetch.go:289-310)
    val robotsFetched = hostsInPlay
      .filter(lit(cfg.polite) && !$"robots_fetched" && $"start_vt" < waveEnd)
      .withColumn("robots_url",
        concat(coalesce(nullif(Funcs.schemeUdf($"first_url"), lit("")), lit("http")),
          lit("://"), $"host", lit("/robots.txt")))
      .join(pages.select($"url".as("robots_url"), $"html".as("robots_body")),
        Seq("robots_url"), "left")
      .withColumn("new_robots_txt",
        when($"robots_body".isNotNull, decode($"robots_body", "UTF-8")).otherwise(lit("")))
      .withColumn("delay_override", robotsDelayUdf($"new_robots_txt", lit(cfg.agent)))
      .select($"host", $"lane", $"robots_url", $"new_robots_txt", $"delay_override",
        $"start_vt".as("r_start"), $"robots_body".isNotNull.as("robots_found"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val hostPlan = hostsInPlay
      .join(robotsFetched.select($"host", $"lane", $"new_robots_txt", $"delay_override"),
        Seq("host", "lane"), "left")
      .withColumn("robots_now", lit(cfg.polite) && !$"robots_fetched" && $"start_vt" < waveEnd)
      .withColumn("eff_robots_txt",
        when($"robots_now", $"new_robots_txt").otherwise(coalesce($"robots_txt", lit(""))))
      .withColumn("eff_delay",
        when($"robots_now" && $"delay_override".isNotNull, $"delay_override")
          .otherwise(coalesce($"crawl_delay_sec", lit(cfg.crawlDelaySec))))
      .select($"host", $"lane", $"robots_now", $"eff_robots_txt", $"eff_delay",
        $"start_vt", $"qdepth")
      // O(hosts-in-play) rows, referenced by the budget, the robots rejoin
      // and the host-state update — cache instead of re-aggregating the
      // queued backlog three times
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-host FIFO take under the politeness budget (fetch.go:345-425 +
    // iq_slice). Only the queue head can survive the vt filter — at most
    // ceil(window/min_delay) rows per (host,lane) — so a constant rank
    // pre-filter lets Spark 4's WindowGroupLimit prune each host's backlog
    // below the window exchange (a million-deep host contributes rankBound
    // rows to the shuffle, not its whole queue), and the window ranks only
    // narrow columns: robots bodies join back per-host AFTER the take.
    // minDelay is one scalar agg over the per-host plan (rows = hosts in
    // play), not over the backlog; the same pass yields the total queued
    // depth (for the post-wave gauge) so the backlog is never re-scanned
    // just to count it.
    // rank bound from the smallest POSITIVE delay: zero-delay hosts are
    // routed around the prune inside politeBudget (they take their whole
    // backlog within the window), so one zero-delay robots line no longer
    // disables WindowGroupLimit for every other host in the wave
    // (round-3 finding: rankBound = Long.MaxValue globally)
    val (minPosDelay: Double, queuedTotal: Long) = {
      val r = hostPlan.agg(min(when($"eff_delay" > 0, $"eff_delay")),
        sum($"qdepth")).head()
      (if (r.isNullAt(0)) cfg.crawlDelaySec else r.getDouble(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val rankBound: Long =
      math.ceil(cfg.waveWindowSec / math.max(minPosDelay, 1e-9)).toLong + 1
    mark("host_plan")
    val budgeted = politeBudget(queued, hostPlan, waveEnd, rankBound)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- 3. robots path gate (P8)
    val gated = budgeted
      .withColumn("path", Funcs.pathUdf($"url"))
      .withColumn("allowed",
        !lit(cfg.polite) || robotsAllowUdf($"eff_robots_txt", $"path", lit(cfg.agent)))
    val disallowed = gated.filter(!$"allowed")

    // ---- 4. offline fetch (S6): resolve against the page table
    val fetched = gated.filter($"allowed")
      .join(pages.select($"url", $"html"), Seq("url"), "left")
      .withColumn("found", $"html".isNotNull)
      .withColumn("body_len", when($"found", length($"html")).otherwise(lit(0)).cast("long"))
      .withColumn("content_type",
        when($"found", Funcs.contentTypeUdf($"url", $"html")).otherwise(lit("")))
      .withColumn("ct_base", trim(split($"content_type", ";").getItem(0)))
      .localCheckpoint()

    mark("fetch_ck")
    // ---- 5. response handlers (P12 mux)
    val getOk = fetched.filter($"method" === "GET" && $"found")
      // fused sniff/is_doc/title: one byte[] copy of the body per row
      // instead of one per UDF (identical semantics to the separate calls)
      .withColumn("pp_", Funcs.pageParseUdf($"html"))
      .withColumn("sniff", $"pp_._1")
      .withColumn("is_doc", $"pp_._2")
      .withColumn("title", $"pp_._3")
      .drop("pp_")
      .withColumn("file_name_new",
        when(!$"is_doc" && !$"sniff".isin(sniffUnwanted: _*), fileNameCol($"url"))
          .otherwise(lit(null)))
      .withColumn("resp_headers", array(lit("Content-Length"), $"body_len".cast("string"),
        lit("Content-Type"), $"content_type"))
      .localCheckpoint()

    val headOk = fetched.filter($"method" === "HEAD" && $"found")
    // only text/html HEAD responses have a handler (crawler.go:79-116)
    val headHtml = headOk.filter($"ct_base" === "text/html")
      .withColumn("resp_headers", array(lit("Content-Length"), $"body_len".cast("string"),
        lit("Content-Type"), $"content_type"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // unmatched HEADs hit the no-op DefaultHandler and keep their enqued slot
    // forever (handler.go:62-64) — blocked tombstones
    val headBlockedRows = headOk.filter($"ct_base" =!= "text/html")
      .select($"url", $"method", $"host", $"lane", $"wave", $"seq",
        lit(StateBlocked).as("state"), $"prio_score")

    // ---- 6. link extraction first (F9) — HandleGetResponse stores links
    // for every doc GET in all lanes (content_crawler only skips the
    // *enqueue*). Runs before the url-table reads because the wave's url
    // key-set (fetched urls + extracted dsts) determines which buckets of
    // the urls table this wave must read at all.
    val linksRaw = getOk.filter($"is_doc")
      .select($"url".as("src"), $"seq".as("src_seq"), $"vt".as("src_vt"),
        $"lane".as("src_lane"),
        posexplode(Funcs.extractLinksUdf($"url", $"html")).as(Seq("href_idx", "dst")))
      .localCheckpoint()

    mark("getok_links_ck")
    val linkRows = linksRaw
      .withColumn("rn_", row_number().over(
        Window.partitionBy($"src", $"dst").orderBy($"href_idx")))
      .filter($"rn_" === 1)
      .select(vtTs($"src_vt").as("created"), vtTs($"src_vt").as("updated"), $"src", $"dst")
      .join(linksView.select($"src", $"dst"), Seq("src", "dst"), "left_anti")

    // dst Read-or-Save (url.go:478-486)
    val dstFirst = linksRaw
      .withColumn("rn_", row_number().over(
        Window.partitionBy($"dst").orderBy($"src_seq", $"href_idx")))
      .filter($"rn_" === 1)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- 6b. the wave's urls slice: bucket-pruned to the keys this wave
    // touches (fetched urls + extracted dsts) — O(delta) read; the full MOR
    // view is only materialized on seed waves
    val urlsWave: DataFrame =
      if (doSeed) urlsSeedFull
      else {
        val keyUrls = budgeted.select($"url")
          .unionByName(dstFirst.select($"dst".as("url")))
        val buckets = keyUrls.select(bucketCol($"url").as("b")).distinct()
          .collect().map(_.getInt(0)).toSeq
        urlsViewBuckets(Some(buckets)).localCheckpoint()
      }
    val urlsReadCount = urlsWave.count()
    mark("urls_wave")

    // ---- 7. url writes (MOR appends)
    val urlsEff = urlsWave.unionByName(seedCreates)

    val getUpdatesRaw = getOk.alias("g")
      .join(urlsEff.alias("u"), col("g.url") === col("u.url"), "inner") // u.Read must succeed
      .select(
        col("g.url").as("url"), col("u.created").as("created"), vtTs($"vt").as("updated"),
        col("u.last_head").as("last_head"), vtTs($"vt").as("last_get"),
        lit(200).as("status"), col("g.content_type").as("content_type"),
        col("g.sniff").as("content_sniff"), col("g.body_len").as("content_length"),
        coalesce(col("g.file_name_new"), col("u.file_name"), lit("")).as("file_name"),
        coalesce(when(col("g.is_doc"), col("g.title")), col("u.title"), lit("")).as("title"),
        col("u.id").as("id"), lit(0).as("headers_took"), lit(0).as("download_took"),
        col("g.resp_headers").as("headers"), col("u.meta").as("meta"),
        col("u.hash").as("hash"))

    val headUpdatesRaw = headHtml.alias("g")
      .join(urlsEff.alias("u"), col("g.url") === col("u.url"), "inner")
      .select(
        col("g.url").as("url"), col("u.created").as("created"), vtTs($"vt").as("updated"),
        vtTs($"vt").as("last_head"), col("u.last_get").as("last_get"),
        lit(200).as("status"), col("g.content_type").as("content_type"),
        col("u.content_sniff").as("content_sniff"), col("g.body_len").as("content_length"),
        col("u.file_name").as("file_name"), col("u.title").as("title"),
        col("u.id").as("id"), lit(0).as("headers_took"), lit(0).as("download_took"),
        col("g.resp_headers").as("headers"), col("u.meta").as("meta"),
        col("u.hash").as("hash"))

    // URL-seen check (J8/A9): sharded bloom prefilter over the committed
    // urls table — candidates the bloom rejects are definitely new (no false
    // negatives per shard) and skip the exact probe; only "maybe seen" pays
    // the anti-join. The same-wave seedCreates delta (not yet in the bloom)
    // is always checked.
    val dstNotSeeded = dstFirst
      .join(seedCreates.select($"url".as("dst")), Seq("dst"), "left_anti")
    // "maybe seen" candidates probe the urls slice via the HASH-EXCHANGE
    // anti-join + string-confirm (Scheduler.hashProbeNewUrls): the table
    // side of the exchange carries xxhash64 longs, the string confirm pays
    // only O(maybe-seen) rows — the round-5 bench kernel's plan, now the
    // production J8 (plan-asserted in ScaleCrawlSpec)
    val dstNew = bloomDir match {
      case Some(dir) =>
        val hit = ShardedBloom.mightContainCol(spark, dir, cfg.bloomShards,
          $"dst", requireShards = true)
        val tagged = dstNotSeeded.withColumn("bloom_hit", hit)
        val definitelyNew = tagged.filter(!$"bloom_hit")
        val maybeSeen = Scheduler.hashProbeNewUrls(
          tagged.filter($"bloom_hit"), urlsWave.select("url"))
        definitelyNew.unionByName(maybeSeen).drop("bloom_hit")
      case _ =>
        Scheduler.hashProbeNewUrls(dstNotSeeded, urlsWave.select("url"))
    }
    val dstCreatesRaw = dstNew
      .select(newUrlRowCols($"dst", vtTs($"src_vt")): _*)

    // the three url-write deltas are mutually independent — materialize
    // them with concurrent job submission (driver-latency-bound actions)
    val Seq(getUpdates, headUpdates, dstCreates) = par(Seq(
      () => getUpdatesRaw.localCheckpoint(),
      () => headUpdatesRaw.localCheckpoint(),
      () => dstCreatesRaw.localCheckpoint()))

    mark("url_write_deltas")
    // ---- 8. snapshots (T9): GET-only append
    val snapshotRows = getOk.select($"url", vtTs($"vt").as("created"),
      lit(200).as("status"), lit(0L).as("duration"), $"resp_headers".as("headers"),
      lit("").as("hash"))

    // ---- 9. next-wave enqueues
    val urlsAfter = urlsEffPlus(urlsEff, getUpdates, headUpdates, dstCreates)

    // enqueueDstLinks (crawler.go:255-292): lanes A and C propagate; B doesn't
    val linkCands = linksRaw.filter($"src_lane".isin("A", "C"))
      .withColumn("rn_", row_number().over(
        Window.partitionBy($"dst").orderBy($"src_seq", $"href_idx")))
      .filter($"rn_" === 1)
      .join(urlsAfter.select($"url".as("dst"), $"last_head", $"content_sniff"),
        Seq("dst"), "left")
      .withColumn("fetchable", Funcs.isFetchableUdf($"dst"))
      .withColumn("head_stale", $"last_head".isNull ||
        unix_timestamp($"last_head") <
          ($"src_vt".cast("long") + lit(baseEpochSec) - lit(cfg.staleDurationSec)))
      .filter($"fetchable" && $"head_stale") // ShouldEnqueueHead (url.go:320-322)
      .withColumn("suspected",
        Funcs.suspectedContentUdf($"dst", coalesce($"content_sniff", lit(""))))
      .select($"dst".as("url"),
        when($"suspected", lit("GET")).otherwise(lit("HEAD")).as("method"),
        Funcs.hostUdf($"dst").as("host"),
        when($"suspected", lit("B")).otherwise(lit("A")).as("lane"),
        $"src_seq".as("ord1"), $"href_idx".cast("long").as("ord2"),
        // staleness frozen at enqueue: age of the dst's last HEAD (the
        // freshness signal this path already joined in); never-seen = max
        coalesce(lit(nowSec) - unix_timestamp($"last_head"),
          lit(NeverFetchedScore)).as("prio_score"))

    // HEAD→GET follow-up (crawler.go:236-252)
    val headFollow = headHtml
      .join(whitelist, Seq("host"), "left_semi")
      .join(urlsAfter.select($"url", $"last_get".as("u_last_get")), Seq("url"), "left")
      .withColumn("get_stale", $"u_last_get".isNull ||
        unix_timestamp($"u_last_get") <
          ($"vt".cast("long") + lit(baseEpochSec) - lit(cfg.staleDurationSec)))
      .filter(Funcs.isFetchableUdf($"url") && $"get_stale") // ShouldEnqueueGet
      .select($"url", lit("GET").as("method"), $"host", lit("A").as("lane"),
        $"seq".as("ord1"), lit(-1L).as("ord2"),
        coalesce(lit(nowSec) - unix_timestamp($"u_last_get"),
          lit(NeverFetchedScore)).as("prio_score"))

    // the `enqued` map check set (crawler.go:27-29): urls still occupying a
    // frontier slot after this wave's takes — all active rows (queued and
    // blocked, one frontier scan) plus this wave's seeds, minus the taken,
    // plus the new blocked tombstones (taken ⊇ new-blocked, so re-adding
    // them after the anti-join is exact). Never materialized as a table:
    // the frontier is MOR — only the transition rows below get written.
    val frontierActiveUrls = frontier0.select("url")
      .unionByName(seedRowsCk.select("url"))
      .join(budgeted.select($"url"), Seq("url"), "left_anti")
      .unionByName(headBlockedRows.select("url"))

    val newEnqueues = linkCands.unionByName(headFollow)
      .withColumn("rn_", row_number().over(
        Window.partitionBy($"url").orderBy($"ord1", $"ord2")))
      .filter($"rn_" === 1)
      .join(frontierActiveUrls, Seq("url"), "left_anti") // enqued map check
      .join(broadcast(uncrawl0), Seq("url"), "left_anti") // uncrawlables gate
      // seq only needs to order within a host (per-host FIFO, T3) — a
      // per-host window keeps this parallel at any frontier size; a global
      // row_number here would single-partition the wave
      .withColumn("seq", lit((w + 1) * SeqStride + EnqueueOffset) +
        row_number().over(Window.partitionBy($"host").orderBy($"ord1", $"ord2", $"url")).cast("long"))
      .select($"url", $"method", $"host", $"lane", lit(w + 1).as("wave"), $"seq",
        lit(StateQueued).as("state"), $"prio_score")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // this wave's frontier delta: O(seeds + takes + blocks + enqueues)
    // transition rows — queue depth never touches the write path (T1/T10
    // at 100x: the backlog can be billions of rows; the delta is bounded
    // by the politeness budget and the wave's link yield)
    val takenRows = budgeted
      .select($"url", $"method", $"host", $"lane", $"wave", $"seq",
        lit(StateTaken).as("state"), $"prio_score")
    val frontierAppends = withFrontierMor(seedRowsCk, w, PrioSeed)
      .unionByName(withFrontierMor(takenRows, w, PrioTaken))
      .unionByName(withFrontierMor(headBlockedRows, w, PrioBlocked))
      .unionByName(withFrontierMor(newEnqueues, w, PrioEnqueued))

    // ---- 10. host state
    val takenPerHost = budgeted.groupBy($"host", $"lane")
      .agg(max($"vt").as("max_vt"))
    // MOR delta: only the hosts whose state actually CHANGED this wave —
    // a robots fetch or at least one take. A backlog host that merely sat
    // queued keeps its old row (or none), so the host_state log grows by
    // O(active hosts) per wave, bounded by the politeness budget — not by
    // O(hosts-with-backlog) (round-3 advice: hostPlan contains every
    // backlog host, and appending them all made the delta O(backlog
    // hosts) regardless of activity). Untouched hosts' next_fetch_vt is
    // in the past either way; the read side's greatest(start_vt,
    // waveStart) already treats a stale value and a missing row alike.
    val hostStateTouched = hostPlan
      .join(takenPerHost, Seq("host", "lane"), "left")
      .filter($"robots_now" || $"max_vt".isNotNull)
      .withColumn("last_vt",
        when($"robots_now" && $"max_vt".isNull, $"start_vt") // only robots ran
          .otherwise(coalesce($"max_vt", $"start_vt" - $"eff_delay")))
      .select($"host", $"lane", lit(cfg.polite).as("robots_fetched"),
        $"eff_robots_txt".as("robots_txt"), $"eff_delay".as("crawl_delay_sec"),
        ($"last_vt" + $"eff_delay").as("next_fetch_vt"))
      .withColumn("h_wave", lit(w))

    // ---- 11. fetch log (crawl-order artifact, O4)
    val robotsLog = robotsFetched.select(lit(w).as("wave"), $"r_start".as("vt"),
      $"host", $"lane", lit("GET").as("method"), $"robots_url".as("url"),
      lit(-1L).as("seq"), when($"robots_found", 200).otherwise(0).as("status"),
      lit("robots").as("outcome"))
    val cmdLog = fetched.select(lit(w).as("wave"), $"vt", $"host", $"lane", $"method",
      $"url", $"seq", when($"found", 200).otherwise(0).as("status"),
      when($"found", lit("ok")).otherwise(lit("error")).as("outcome"))
    val disallowedLog = disallowed.select(lit(w).as("wave"), $"vt", $"host", $"lane",
      $"method", $"url", $"seq", lit(0).as("status"), lit("disallowed").as("outcome"))
    val fetchLogRows = robotsLog.unionByName(cmdLog).unionByName(disallowedLog)

    // ---- 12. stage, lineage, atomic commit
    // the bloom thunk records which shard dir the new manifest references,
    // so post-commit pruning knows the one live dir without a Spark job
    val bloomKeep = new java.util.concurrent.atomic.AtomicReference[String](null)
    val urlAppends = withMor(seedCreates, w, 1)
      .unionByName(withMor(getUpdates, w, 2))
      .unionByName(withMor(headUpdates, w, 2))
      .unionByName(withMor(dstCreates, w, 1))

    // Every staged table write is independent of the others, and the wave's
    // three stat counts read already-materialized frames — submit them all
    // concurrently (the wave is driver-job-latency-bound; the writes also
    // overlap their input materializations). "#"-keyed results are counts,
    // everything else is (table -> staged version).
    val actions = Seq[() => (String, Long)](
      // cluster the delta by bucket so each output file covers few buckets —
      // the bucket isin-filter then skips whole files via parquet stats
      () => ("urls", store.stageAppend("urls", urlAppends.repartition(col("ubucket")))),
      () => ("links", store.stageAppend("links", linkRows)),
      () => ("snapshots", store.stageAppend("snapshots", snapshotRows)),
      () => ("fetch_log", store.stageAppend("fetch_log", fetchLogRows)),
      // frontier deltas cluster by fbucket like the urls table: point reads
      // (seedUrl/markUncrawlable) prune to one bucket's files via parquet
      // stats, and compaction can rewrite buckets independently
      () => ("frontier", store.stageAppend("frontier",
        frontierAppends.repartition(col("fbucket")))),
      () => ("host_state", store.stageAppend("host_state", hostStateTouched)),
      () => ("#taken", budgeted.count()),
      () => ("#ok", fetched.filter($"found").count()),
      () => ("#enq", newEnqueues.count())
    ) ++ (if (doSeed)
      Seq(() => ("whitelist", store.stageRewrite("whitelist", whitelist))) else Nil
    ) ++ (if (cfg.useBloomPrefilter) Seq(() => {
      // merge this wave's new urls into the sharded seen bloom: per-shard
      // delta blooms built distributed, OR-merged into the previous
      // version's shard files executor-side, published as a new version dir
      // with the wave's manifest (dstCreates is already materialized, so
      // the probe above saw the pre-merge filters — ordering is safe)
      val newUrls = seedCreates.select("url").unionByName(dstCreates.select("url"))
      // empty delta: re-point the manifest at the previous shard dir instead
      // of rebuilding — most steady-state waves add few or no urls
      val anyNew = !newUrls.isEmpty
      val newDir =
        if (anyNew || bloomDir.isEmpty) {
          val d = s"${store.rootPath}/seen_bloom/v$w"
          ShardedBloom.buildToDir(spark, newUrls, "url", cfg.bloomShards,
            perShardItems, cfg.bloomFpp, d, bloomDir)
          d
        } else bloomDir.get
      bloomKeep.set(newDir)
      ("seen_bloom_meta", store.stageRewrite("seen_bloom_meta",
        Seq((w, newDir, cfg.bloomShards, perShardItems, cfg.bloomFpp))
          .toDF("wave", "dir", "shards", "per_shard_items", "fpp")))
    }) else Nil)
    mark("plan_build")
    val results = par(actions)
    mark("stage_writes")
    val staged = results.filterNot(_._1.startsWith("#"))
    val countOf = results.filter(_._1.startsWith("#")).toMap

    // per-partition lineage of the committed files (T10 resumability
    // evidence): full per-partition rows for the two load-bearing state
    // tables (one Spark job each); every other staged delta is counted from
    // its parquet FOOTERS on the driver — the same metadata an Iceberg
    // manifest records at commit time, with zero extra cluster jobs
    val bigTables = Set("urls", "frontier")
    val perPart = staged.filter(kv => bigTables(kv._1)).map { case (t, v) =>
      spark.read.parquet(store.versionPath(t, v))
        .groupBy(spark_partition_id().as("partition_id"))
        .agg(count(lit(1)).as("rows"))
        .withColumn("wave", lit(w)).withColumn("table", lit(t))
        .withColumn("version", lit(v))
        .select("wave", "table", "partition_id", "rows", "version")
    }
    val footerDF = staged.filterNot(kv => bigTables(kv._1))
      .map { case (t, v) =>
        (w, t, -1, footerRowCount(store.versionPath(t, v)), v)
      }.toDF("wave", "table", "partition_id", "rows", "version")
    val lineageDF = (perPart :+ footerDF).reduce(_ unionByName _)
    store.stageAppend("lineage", lineageDF)
    mark("lineage")

    val takenCount = countOf("#taken")
    val okCount = countOf("#ok")
    val enqCount = countOf("#enq")
    // queue depth after this wave, from the deltas (never re-materializes
    // the frontier): queued-before-incl-seeds - taken + enqueued
    val depth = queuedTotal - takenCount + enqCount

    store.commitWave(w)
    mark("commit")

    // prune superseded seen_bloom dirs now that the commit re-pointed the
    // manifest: each published dir is CUMULATIVE (the merge folds the
    // previous version's shards in), so only the referenced dir is live —
    // without this a W-wave crawl keeps W full copies of the filter set
    // (these dirs live outside TableStore snapshot expiry). A resume from
    // an older snapshot falls back to rebuild-from-urls (dir check above).
    Option(bloomKeep.get()).foreach { d =>
      pruneBloomDirs(d); bloomDirCache = Some(d)
    }

    Seq(frontier0, urlsSeedFull, urlsWave, seedRowsCk, robotsFetched, hostPlan, budgeted,
      fetched, getOk, headHtml, getUpdates, headUpdates, linksRaw, dstFirst,
      dstCreates, newEnqueues, whitelist)
      .filter(_ != null)
      .foreach(df => try df.unpersist() catch { case _: Throwable => () })
    // free this wave's localCheckpoint blocks (see rddsBefore above): every
    // checkpointed frame is wave-scoped — nothing outside runWave reads one
    // after it returns — so dropping the blocks is safe and keeps the
    // BlockManager flat across arbitrarily many waves
    val rddsAfter = spark.sparkContext.getPersistentRDDs
    (rddsAfter.keySet -- rddsBefore).foreach { id =>
      try rddsAfter(id).unpersist(blocking = false)
      catch { case _: Throwable => () }
    }

    WaveStats(w, takenCount, okCount, enqCount, depth, urlsReadCount)
  }

  /** Delete every seen_bloom version dir except `keep` (the dir the
    * just-committed manifest references). Safe mid-crash: pruning runs
    * only AFTER commitWave, so an interrupted wave leaves the previous
    * meta and its dir intact, and the orphaned new dir is swept on the
    * next successful wave. */
  private def pruneBloomDirs(keep: String): Unit = {
    import java.nio.file.{Files, Paths}
    val base = Paths.get(s"${store.rootPath}/seen_bloom")
    if (!Files.isDirectory(base)) return
    val keepName = Paths.get(keep).getFileName
    import scala.jdk.CollectionConverters._
    Files.list(base).iterator().asScala.toSeq
      .filter(d => Files.isDirectory(d) && d.getFileName != keepName)
      .foreach { d =>
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
  }

  // -------------------------------------------------------------- run loops

  /** Run waves until the frontier drains (quiescent mode) or maxWaves. */
  def run(maxWaves: Int): Seq[WaveStats] = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[WaveStats]
    var w = store.currentWave + 1
    var continue = true
    val waveDebug = sys.env.contains("GRAFT_WAVE_DEBUG")
    while (continue && w < maxWaves) {
      val t0 = System.nanoTime()
      val s = runWave(w)
      if (waveDebug) System.err.println(
        f"[wave] $w ${(System.nanoTime() - t0) / 1e9}%.2fs taken=${s.taken} enq=${s.enqueued}")
      stats += s
      if (cfg.compactEvery > 0 && w > 0 && w % cfg.compactEvery == 0) compactTables()
      if (s.frontierDepth == 0 && s.taken == 0 && s.enqueued == 0 && w > 0) continue = false
      w += 1
    }
    stats.toSeq
  }

  /** Current queued-command count (A10 queue-depth gauge, crawler.go:143). */
  def frontierDepth: Long =
    frontierDF.filter($"state" === StateQueued).count()

  /** The committed frontier (GET /que view). */
  def frontierView: DataFrame = frontierDF

  /** POST /que equivalent (handlers.go:42-108): validate the url against
    * the registered source prefixes — `ValidArchivingUrl`
    * (core/urls.go:111-121, the J7 containment shape: candidate ILIKE
    * '%'||source.url||'%') — then audit the request, create the Url row if
    * unseen (SeedUrlHandler's Read-or-Create), and enqueue a GET on lane C,
    * the seed crawler whose extracted links feed lane A
    * (seed_crawler.go:58). Returns false — no audit row, no url row, no
    * enqueue, matching the reference's 400-before-insert order
    * (handlers.go:69-75) — when the url is inside no registered prefix.
    * Soft-deleted sources do not validate (engine policy consistent with
    * P9; the reference's legacy `suburls` table predates its soft-delete
    * column). All reads are point lookups: the frontier check prunes to
    * one fbucket, the urls check to one ubucket. */
  def seedUrl(url: String): Boolean = {
    store.resetPending()
    val w = store.currentWave + 1
    val valid = !sourcesDF
      .filter(!coalesce($"deleted", lit(false)) && length($"url") > 0 &&
        lower(lit(url)).contains(lower($"url")))
      .isEmpty
    if (!valid) return false
    // uncrawlables gate, same invariant as the wave seeder's anti-join:
    // a manually-blocked url must never re-enter the frontier, including
    // via POST /que. Without this, a seed AFTER markUncrawlable would
    // append a queued transition at a higher f_wave that outranks the
    // eviction tombstone and the url would be fetched again. (Deleting
    // the uncrawlable row un-blocks the url — MutationsSpec.)
    if (!uncrawlablesView.filter($"url" === url).isEmpty) return false
    val ts = timestamp_seconds(lit(baseEpochSec + (w * cfg.waveWindowSec).toLong))
    val row = Seq((url, "GET", GoUrl.hostOf(url), "C", w,
        w * SeqStride + (1L << 20), StateQueued, NeverFetchedScore))
      .toDF("url", "method", "host", "lane", "wave", "seq", "state", "prio_score")
    // enqued-map check (Read-or-Create): only append the queued transition
    // if the url holds no frontier slot — an O(delta) append, not a rewrite
    val alreadyActive = frontierRowsFor(url).limit(1).count() > 0
    if (!alreadyActive)
      store.stageAppend("frontier", withFrontierMor(row, w, PrioSeed))
    // Read-or-Create the url row (handlers.go:83-101)
    val creates = row.select($"url")
      .join(urlsViewBuckets(Some(Seq(urlBucketOf(url)))).select("url"),
        Seq("url"), "left_anti")
      .select(newUrlRowCols($"url", ts): _*)
    store.stageAppend("urls", withMor(creates, w, 1))
    // audit log (archive_requests insert, handlers.go:75)
    store.stageAppend("archive_requests",
      Seq((url, w)).toDF("url", "wave").select($"url", ts.as("created"), $"wave"))
    store.commitWave(store.currentWave)
    true
  }

  /** POST /uncrawlables twin (UncrawlableHandler): record a manual
    * don't-crawl url and evict it from the queued frontier. */
  def markUncrawlable(url: String): Unit = {
    store.resetPending()
    val w = store.currentWave
    val ts = timestamp_seconds(lit(baseEpochSec + ((w + 1) * cfg.waveWindowSec).toLong))
    store.stageAppend("uncrawlables",
      Seq(Tuple1(url)).toDF("url").select($"url", ts.as("created")))
    // evict a queued command via a MOR tombstone (blocked rows keep their
    // state; the uncrawlables gate already blocks re-enqueue either way).
    // The eviction is STAMPED AT WAVE w+1: seedUrl and runWave stamp their
    // queued transitions at currentWave+1 and the MOR view orders f_wave
    // before f_prio, so a w-stamped eviction would be outranked by a seed
    // issued in the same API cycle (round-3 advice: seedUrl-then-
    // markUncrawlable left the url queued and fetchable). PrioEvicted=5
    // outranks every transition runWave(w+1) itself can write.
    val evicted = frontierRowsFor(url).filter($"state" === StateQueued)
      .withColumn("state", lit(StateTaken))
    store.stageAppend("frontier", withFrontierMor(evicted, w + 1, PrioEvicted))
    store.commitWave(w)
  }

  /** Compact MOR tables (Iceberg rewrite_data_files equivalent). The
    * frontier compaction materializes the live view (queued + blocked; all
    * taken tombstones fold away) as one wave-stamped version, bounding the
    * transition-log read amplification on the same cadence as urls. */
  def compactTables(): Unit = {
    // Winner rows keep their ORIGINAL MOR stamps. Re-stamping everything at
    // the compaction wave (the old behavior) made the CDC readers
    // (`urlsChangedSince`/`frontierChangedSince`, which filter on
    // w_wave/f_wave > checkpoint) report the WHOLE table as changed after
    // every compaction — with compactEvery=8 that collapsed the documented
    // O(delta) incremental read into a full-table reprocess every 8 waves.
    // Preserving stamps is latest-wins-safe: later deltas are always
    // stamped at a strictly higher wave, so they still outrank.
    store.compact("urls",
      urlsWinnersStamped.repartition(col("ubucket")))
    store.compact("links", linksView)
    store.compact("snapshots", snapshotsView)
    store.compact("frontier",
      frontierWinnersStamped.repartition(col("fbucket")))
    store.compact("host_state", hostWinnersStamped)
    store.commitWave(store.currentWave)
  }

  /** urls latest-wins winners WITH their original (w_wave, w_prio, ubucket)
    * columns — the compaction shape (the live view drops the stamps). */
  private def urlsWinnersStamped: DataFrame =
    store.readAppendOnly("urls") match {
      case None => withMor(emptyDF[UrlRow], store.currentWave, 2).limit(0)
      case Some(df0raw) =>
        val withB =
          if (df0raw.columns.contains("ubucket"))
            df0raw.withColumn("ubucket", coalesce($"ubucket", bucketCol($"url")))
          else df0raw.withColumn("ubucket", bucketCol($"url"))
        val df0 = withB // pre-MOR files read as wave-0 stamps
          .withColumn("w_wave", coalesce($"w_wave", lit(0L)))
          .withColumn("w_prio", coalesce($"w_prio", lit(0)))
        val w = Window.partitionBy("url").orderBy(desc("w_wave"), desc("w_prio"))
        df0.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1).drop("rn_")
    }

  /** Frontier latest-wins winners WITH stamps; taken tombstones (and the
    * urls they supersede) drop out of the compacted log entirely — history
    * truncation is the point of compaction. */
  private def frontierWinnersStamped: DataFrame =
    frontierLog match {
      case None =>
        withFrontierMor(emptyFrontierDF, store.currentWave, 0).limit(0)
      case Some(log) =>
        val w = Window.partitionBy("url").orderBy(desc("f_wave"), desc("f_prio"))
        log.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1)
          .drop("rn_").filter($"state" =!= StateTaken)
    }

  /** host_state latest-wins winners WITH their h_wave stamp. */
  private def hostWinnersStamped: DataFrame =
    store.readAppendOnly("host_state") match {
      case None => emptyHostStateDF.withColumn("h_wave", lit(0L)).limit(0)
      case Some(df0raw) =>
        val df0 =
          if (df0raw.columns.contains("h_wave"))
            df0raw.withColumn("h_wave", coalesce($"h_wave", lit(0L)))
          else df0raw.withColumn("h_wave", lit(0L))
        val w = Window.partitionBy("host", "lane").orderBy(desc("h_wave"))
        df0.withColumn("rn_", row_number().over(w)).filter($"rn_" === 1).drop("rn_")
    }

  // -------------------------------------------------------------- helpers

  /** Per-host FIFO politeness take: rank the queue narrow (url, method,
    * host, lane, wave, seq + the per-host plan scalars — never the robots
    * body), pre-filter on a constant rank bound so WindowGroupLimit keeps
    * only each (host,lane) queue head below the exchange, stamp virtual
    * fetch times at eff_delay spacing, keep rows inside the wave window,
    * then join the robots text back per (host,lane) for the gate.
    *
    * `rankBound` must cover every POSITIVE-delay host (it is derived from
    * the minimum positive delay, so `ceil(window/minPosDelay)+1 >=
    * ceil(window/delay_h)+1` for each). Zero-delay hosts — a robots
    * `Crawl-delay: 0` line — legitimately take their whole backlog inside
    * the window, so they bypass the rank prune on a separate (normally
    * empty) branch; the bulk of the wave keeps its WindowGroupLimit
    * regardless of one pathological host (round-3 fix: the old constant
    * bound collapsed to Long.MaxValue globally when any host had delay 0). */
  private[graft] def politeBudget(queued: DataFrame, hostPlan: DataFrame,
      waveEnd: Double, rankBound: Long): DataFrame = {
    // priority mode ranks each host's queue most-stale-first (score frozen
    // at enqueue — no take-time scoring join), seq as the deterministic
    // tiebreak; default is the reference's FIFO. Same WindowGroupLimit
    // prune either way — only the ORDER inside each host changes.
    val takeOrder =
      if (cfg.stalenessPriority) Seq(desc("prio_score"), asc("seq"))
      else Seq(asc("seq"))
    val wSeq = Window.partitionBy($"host", $"lane").orderBy(takeOrder: _*)
    val hostPlanNarrow = hostPlan
      .select($"host", $"lane", $"robots_now", $"eff_delay", $"start_vt")
    val joined = queued.join(hostPlanNarrow, Seq("host", "lane"))
    val posRanked = joined.filter($"eff_delay" > 0)
      .withColumn("rn", row_number().over(wSeq))
      .filter($"rn" <= rankBound)
    val zeroRanked = joined.filter($"eff_delay" <= 0)
      .withColumn("rn", row_number().over(wSeq))
    posRanked.unionByName(zeroRanked)
      .withColumn("vt",
        when($"robots_now", $"start_vt" + $"rn" * $"eff_delay")
          .otherwise($"start_vt" + ($"rn" - 1) * $"eff_delay"))
      .filter($"vt" < waveEnd && $"start_vt" < waveEnd)
      .join(hostPlan.select($"host", $"lane", $"eff_robots_txt"),
        Seq("host", "lane"))
  }

  private val sniffUnwanted: Seq[String] =
    graft.functions.Sniff.unwantedMimetypes.toSeq.sorted

  private def fileNameCol(urlCol: Column): Column = {
    // HandleGetResponse filename branch (url.go:196-211): ext must be in the
    // ffi whitelist and not a notContent extension
    val fname = Funcs.filenameUdf(urlCol)
    val ext = Funcs.extUdf(urlCol)
    when(Funcs.extMimeUdf(ext).isNotNull &&
      !ext.isin(graft.functions.Sniff.notContentExtensions.toSeq.sorted: _*) && ext =!= "",
      fname).otherwise(lit(null))
  }

  /** Fresh UrlRow columns (dst Read-or-Save create, url.go:432-436). */
  private def newUrlRowCols(urlCol: Column, ts: Column): Seq[Column] = Seq(
    urlCol.as("url"), ts.as("created"), ts.as("updated"),
    lit(null).cast("timestamp").as("last_head"), lit(null).cast("timestamp").as("last_get"),
    lit(0).as("status"), lit("").as("content_type"), lit("").as("content_sniff"),
    lit(0L).as("content_length"), lit("").as("file_name"), lit("").as("title"),
    Funcs.urlIdUdf(urlCol).as("id"), lit(0).as("headers_took"), lit(0).as("download_took"),
    array().cast("array<string>").as("headers"),
    map().cast("map<string,string>").as("meta"), lit("").as("hash"))

  private lazy val emptyUrlRows: DataFrame = {
    import Model._
    emptyDF[UrlRow]
  }

  /** Sum of parquet-footer record counts under a version dir — commit-time
    * metadata (what an Iceberg manifest stores), read driver-side without a
    * Spark job. Only used for the small per-wave deltas. */
  private def footerRowCount(dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  private def withMor(df: DataFrame, w: Long, prio: Int): DataFrame =
    df.withColumn("w_wave", lit(w)).withColumn("w_prio", lit(prio))
      .withColumn("ubucket", bucketCol(col("url")))

  /** urls state visible to same-wave reads: base ∪ this wave's writes. */
  private def urlsEffPlus(urlsEff: DataFrame, getUpd: DataFrame,
      headUpd: DataFrame, creates: DataFrame): DataFrame = {
    val all = urlsEff.withColumn("p_", lit(0))
      .unionByName(getUpd.withColumn("p_", lit(2)))
      .unionByName(headUpd.withColumn("p_", lit(2)))
      .unionByName(creates.withColumn("p_", lit(1)))
    val w = Window.partitionBy("url").orderBy(desc("p_"))
    all.withColumn("rn_", row_number().over(w)).filter(col("rn_") === 1)
      .drop("rn_", "p_")
  }
}

/** Per-executor robots parse cache keyed by content (P8). Deliberately
  * stops caching (rather than evicting) past 10k distinct bodies: robots
  * bodies repeat per host and the parse is cheap, so an unbounded-growth
  * guard is all that's needed at sandbox scale; a M-host deployment would
  * swap this for an LRU keyed by body hash. */
object RobotsCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Robots.RobotsData]()
  def get(txt: String): Robots.RobotsData = {
    var d = cache.get(txt)
    if (d == null) {
      d = Robots.parse(txt)
      if (cache.size() < 10000) cache.put(txt, d)
    }
    d
  }
}
