package graft

import graft.crawl.Fixtures
import graft.functions.{HtmlTok, LinkExtract, Sniff, Hashing, GoUrl}

/** Pure-JVM probe: how much of the wave kernel's thread-scaling shortfall
  * is the MACHINE (one memory bus, shared caches, GC) rather than Spark?
  *
  * Two phases mirror the two halves of `Bench.waveKernel`, APPLES-TO-APPLES
  * (round-5 rework — the round-4 probe shuffled 9.6M raw generated strings
  * while the kernel's dedup phase re-decodes html, extracts+resolves hrefs,
  * and exchanges hashes, so the "ceiling" measured a different workload):
  *   - map:     generate + sniff + title + extract + resolve + hash per page
  *     (the kernel's fetch_map_pass) — unchanged;
  *   - shuffle: the kernel's extract_dedup_pass at the SAME row counts and
  *     the same per-row work: per page, generate the html and extract +
  *     resolve its hrefs (the same LinkExtract kernel the Spark UDF runs),
  *     hash each dst url to a 64-bit long, hash-partition the LONGS across
  *     threads into per-producer buckets (the 8-byte exchange analog of the
  *     hash-probe kernel); producers also partition the 1M seen-url hashes
  *     (the analog of the timed bucket-clustered table scan); consumers
  *     build the bucket's seen hash-set shard, dedup the bucket's delta
  *     hashes, and count the ones missing from the seen set (shuffle read +
  *     distinct + anti-join analog).
  * Each phase reports its own 8→32-thread efficiency: the per-phase numbers
  * are the no-Spark single-box ceilings the Spark kernel phases are judged
  * against in BASELINE.md.
  */
object ThreadScaleProbe {

  /** Minimal open-addressing long hash set (power-of-two, linear probe) —
    * the no-boxing analog of the per-partition hash builds Spark's
    * ShuffledHashJoin and partial-distinct do. 0 is reserved (never a
    * splitmix output for real urls in practice; guarded anyway). */
  private final class LongSet(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(expected * 2, 16) - 1) << 1
    private var mask = cap - 1
    private var arr = new Array[Long](cap)
    private var n = 0
    private var hasZero = false
    def add(v: Long): Boolean = {
      if (v == 0L) { val r = !hasZero; hasZero = true; return r }
      if (n * 10L >= cap * 7L) grow()
      var i = (scramble(v) & mask).toInt
      while (arr(i) != 0L) {
        if (arr(i) == v) return false
        i = (i + 1) & mask
      }
      arr(i) = v; n += 1; true
    }
    def contains(v: Long): Boolean = {
      if (v == 0L) return hasZero
      var i = (scramble(v) & mask).toInt
      while (arr(i) != 0L) {
        if (arr(i) == v) return true
        i = (i + 1) & mask
      }
      false
    }
    def size: Int = n + (if (hasZero) 1 else 0)
    @inline private def scramble(v: Long): Long = {
      var z = v * 0x9e3779b97f4a7c15L
      z ^ (z >>> 32)
    }
    private def grow(): Unit = {
      val old = arr
      cap <<= 1; mask = cap - 1
      arr = new Array[Long](cap); n = 0
      var i = 0
      while (i < old.length) { if (old(i) != 0L) add(old(i)); i += 1 }
    }
  }

  /** Growable primitive long buffer (ArrayBuffer[Long] would box). */
  private final class LongBuf(initial: Int) {
    private var arr = new Array[Long](math.max(initial, 16))
    var len = 0
    def add(v: Long): Unit = {
      if (len == arr.length) {
        val next = new Array[Long](arr.length * 2)
        System.arraycopy(arr, 0, next, 0, len); arr = next
      }
      arr(len) = v; len += 1
    }
    def apply(i: Int): Long = arr(i)
  }

  /** 64-bit string hash (FNV-1a over UTF-16 chars + avalanche) — the
    * probe's analog of the kernel's xxhash64(url) column; the hash itself
    * is a negligible slice of the per-row cost (generation + extraction
    * dominate), so the exact function does not matter for the ceiling. */
  @inline private def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  def main(args: Array[String]): Unit = {
    val cfg = Fixtures.ScaleConfig(hosts = 2048, pagesPerHost = 512, outDegree = 16)
    val total = 400000
    // shuffle phase at the KERNEL's row counts: all 1,048,576 pages'
    // extracted links (x outDegree dsts) and the full 1M seen-url set
    val linkPages = cfg.hosts * cfg.pagesPerHost
    val seenUrls = cfg.hosts * cfg.pagesPerHost

    def work(lo: Int, hi: Int): Long = {
      var acc = 0L
      var i = lo
      while (i < hi) {
        // scaleSiteUrls' enumeration (h = i div pagesPerHost): the old
        // `i % hosts, i % pagesPerHost` had pagesPerHost dividing hosts, so
        // the pair was fully determined by i % hosts — 2048 distinct pages
        // recycled through caches instead of the kernel's distinct-page
        // stream (round-5 ADVICE finding: the ceiling measured a different
        // workload than the kernel it judges)
        val h = (i / cfg.pagesPerHost) % cfg.hosts
        val p = i % cfg.pagesPerHost
        val url = Fixtures.pageUrl(cfg, h, p)
        val html = Fixtures.pageHtml(cfg, h, p)
        val bytes = html.getBytes("UTF-8")
        val sniff = Sniff.detectContentType(bytes)
        if (sniff.startsWith("text/html")) {
          acc += HtmlTok.extractTitle(html).length
          acc += LinkExtract.extractLinks(url, html).length
        }
        acc += Hashing.multihash(bytes).length
        acc += GoUrl.hostOf(url).length
        i += 1
      }
      acc
    }

    def runMap(threads: Int): Double = {
      val per = total / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { work(t * per, (t + 1) * per); () })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    /** Shuffle analog of the hash-probe extract_dedup_pass: producers
      * regenerate each page's html, extract+resolve its links, hash the
      * dst urls to longs and hash-partition them into per-(producer,
      * bucket) FILES — a shuffle barrier must MATERIALIZE partitioned
      * data for the next stage, and Spark's map tasks write/fsync theirs
      * through the same one filesystem + page cache all 32 threads
      * share, so a RAM-buffer "exchange" would overstate the machine's
      * ceiling (measured: the in-memory variant scaled 0.65-0.74 where
      * Spark's file-backed exchange cannot — that contention is the
      * machine's, not Spark's). Producers also partition the 1M seen-url
      * hashes (in-memory — analog of the ~8MB bucketed table scan);
      * consumers read bucket b's spill files across all producers, build
      * the seen shard, dedup the delta hashes, and count misses. */
    def runShuffle(threads: Int): Double = {
      val pagesPer = linkPages / threads
      val seenPer = seenUrls / threads
      val dir = java.nio.file.Files.createTempDirectory("probe-shuffle")
      val t0 = System.nanoTime()
      val seenB = Array.fill(threads, threads)(new LongBuf(seenPer / threads + 16))
      def spill(t: Int, b: Int) = dir.resolve(s"m$t-r$b.bin")
      val producers = (0 until threads).map { t =>
        val th = new Thread(() => {
          // seen-table scan analog: this thread's slice of the 1M urls,
          // enumerated like scaleSiteUrls (h = s div pagesPerHost) so the
          // seen set really holds the kernel's 1M-distinct url universe —
          // the old `s % hosts` spelling collapsed it to 2048 distinct
          // urls (~64 cache-resident entries per shard) and made nearly
          // every delta hash a "miss" (round-5 ADVICE finding)
          var s = t * seenPer
          while (s < (t + 1) * seenPer) {
            val uh = hash64(Fixtures.pageUrl(cfg,
              (s / cfg.pagesPerHost) % cfg.hosts, s % cfg.pagesPerHost))
            seenB(t)(((uh & 0x7fffffffL) % threads).toInt).add(uh)
            s += 1
          }
          // link-delta analog: decode + extract + resolve + hash per page,
          // buffered binary write into one spill file per reduce bucket
          val outs = Array.tabulate(threads) { b =>
            new java.io.DataOutputStream(new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(spill(t, b).toFile), 1 << 16))
          }
          var i = t * pagesPer
          while (i < (t + 1) * pagesPer) {
            // distinct-page enumeration, mirroring the kernel's generator
            val hh = (i / cfg.pagesPerHost) % cfg.hosts
            val pp = i % cfg.pagesPerHost
            val url = Fixtures.pageUrl(cfg, hh, pp)
            val html = Fixtures.pageHtml(cfg, hh, pp)
            val ls = LinkExtract.extractLinks(url, html)
            var j = 0
            while (j < ls.length) {
              val uh = hash64(ls(j))
              outs(((uh & 0x7fffffffL) % threads).toInt).writeLong(uh)
              j += 1
            }
            i += 1
          }
          outs.foreach(_.close())
        })
        th.start(); th
      }
      producers.foreach(_.join())
      val missing = new java.util.concurrent.atomic.AtomicLong()
      val consumers = (0 until threads).map { b =>
        val th = new Thread(() => {
          val seenSet = new LongSet(seenUrls / threads + 16)
          var t = 0
          while (t < threads) {
            val buf = seenB(t)(b)
            var k = 0
            while (k < buf.len) { seenSet.add(buf(k)); k += 1 }
            t += 1
          }
          val dedup = new LongSet(1 << 16)
          var miss = 0L
          t = 0
          while (t < threads) {
            val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
              new java.io.FileInputStream(spill(t, b).toFile), 1 << 16))
            val n = (java.nio.file.Files.size(spill(t, b)) / 8L).toInt
            var k = 0
            while (k < n) {
              val v = in.readLong()
              if (dedup.add(v) && !seenSet.contains(v)) miss += 1
              k += 1
            }
            in.close()
            t += 1
          }
          missing.addAndGet(miss)
        })
        th.start(); th
      }
      consumers.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      // cleanup outside the timed region
      (0 until threads).foreach(t => (0 until threads).foreach(b =>
        java.nio.file.Files.deleteIfExists(spill(t, b))))
      java.nio.file.Files.deleteIfExists(dir)
      dt
    }

    runMap(4); runShuffle(4) // warmup JIT
    // three interleaved reps per level, min kept: single-box timings drift
    // several percent run to run (hypervisor neighbors, allocator state),
    // and interleaving means a slow machine phase hits both levels alike
    // instead of biasing the ratio
    val reps = (0 until 3).map { _ =>
      val m8 = runMap(8); val m32 = runMap(32)
      val s8 = runShuffle(8); val s32 = runShuffle(32)
      (m8, m32, s8, s32)
    }
    val m8 = reps.map(_._1).min; val m32 = reps.map(_._2).min
    val s8 = reps.map(_._3).min; val s32 = reps.map(_._4).min
    // machine-parseable line for Bench (same-session ceiling evidence)
    println(f"PROBE $m8%.3f $m32%.3f $s8%.3f $s32%.3f")
    println(f"THREADS map t8=$m8%.2f t32=$m32%.2f eff=${m8 / m32 / 4}%.2f | " +
      f"shuffle t8=$s8%.2f t32=$s32%.2f eff=${s8 / s32 / 4}%.2f")
  }
}
