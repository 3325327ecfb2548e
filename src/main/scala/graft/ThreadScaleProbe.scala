package graft

import graft.crawl.Fixtures
import graft.functions.{HtmlTok, LinkExtract, Sniff, Hashing, GoUrl}

/** Pure-JVM probe: how much of the wave kernel's thread-scaling shortfall
  * is the MACHINE (one memory bus, shared caches, GC) rather than Spark?
  *
  * Two phases mirror the two halves of `Bench.waveKernel`:
  *   - map:     generate + sniff + title + extract + resolve + hash per page
  *     (the kernel's fetch_map_pass);
  *   - shuffle: generate link dst urls, hash-partition them across threads
  *     into per-producer buckets (shuffle write analog), then per-bucket
  *     dedup into hash sets and probe a seen-set (shuffle read + distinct +
  *     anti-join analog — the kernel's extract_dedup_pass).
  * Each phase reports its own 8→32-thread efficiency: the per-phase numbers
  * are the no-Spark single-box ceilings the Spark kernel phases are judged
  * against in BASELINE.md.
  */
object ThreadScaleProbe {
  def main(args: Array[String]): Unit = {
    val cfg = Fixtures.ScaleConfig(hosts = 2048, pagesPerHost = 512, outDegree = 16)
    val total = 400000
    val linkPages = 600000 // pages in the shuffle phase (x outDegree dsts):
    // sized so the 8-thread phase runs ~2s — the old 200k finished in 0.6s,
    // where scheduler jitter alone swings the 8->32 ratio by 2x

    def work(lo: Int, hi: Int): Long = {
      var acc = 0L
      var i = lo
      while (i < hi) {
        val h = i % cfg.hosts
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

    /** Shuffle analog: producers hash-partition generated dst-url strings
      * into per-(producer,bucket) buffers; consumers dedup bucket b across
      * all producers and count urls missing from the (sharded) seen-set. */
    def runShuffle(threads: Int): Double = {
      val per = linkPages / threads
      val t0 = System.nanoTime()
      val buffers = Array.fill(threads, threads)(
        new scala.collection.mutable.ArrayBuffer[String](per * cfg.outDegree / threads + 16))
      val producers = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t * per
          while (i < (t + 1) * per) {
            var j = 0
            while (j < cfg.outDegree) {
              val dh = (Fixtures.mix(cfg.seed, i.toLong * 31 + j) & 0x7fffffffL) % cfg.hosts
              val dp = (Fixtures.mix(cfg.seed, i.toLong * 37 + j) & 0x7fffffffL) % cfg.pagesPerHost
              val dst = Fixtures.pageUrl(cfg, dh.toInt, dp.toInt)
              buffers(t)(((dst.hashCode & 0x7fffffff) % threads)) += dst
              j += 1
            }
            i += 1
          }
        })
        th.start(); th
      }
      producers.foreach(_.join())
      val missing = new java.util.concurrent.atomic.AtomicLong()
      val consumers = (0 until threads).map { b =>
        val th = new Thread(() => {
          val seen = new java.util.HashSet[String]()
          var t = 0
          while (t < threads) {
            val buf = buffers(t)(b)
            var k = 0
            while (k < buf.length) { seen.add(buf(k)); k += 1 }
            t += 1
          }
          missing.addAndGet(seen.size.toLong)
        })
        th.start(); th
      }
      consumers.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
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
