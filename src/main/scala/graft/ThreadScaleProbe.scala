package graft

import graft.crawl.Fixtures
import graft.functions.{HtmlTok, LinkExtract, Sniff, Hashing, GoUrl}

/** Pure-JVM probe: does the per-page kernel work (generate + sniff + title +
  * extract + resolve + hash) scale with threads without Spark in the way? */
object ThreadScaleProbe {
  def main(args: Array[String]): Unit = {
    val cfg = Fixtures.ScaleConfig(hosts = 2048, pagesPerHost = 512, outDegree = 16)
    val total = 400000

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

    def run(threads: Int): Double = {
      val per = total / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { work(t * per, (t + 1) * per); () })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    run(4) // warmup JIT
    val t8a = run(8); val t32a = run(32)
    val t32b = run(32); val t8b = run(8)
    val t8 = math.min(t8a, t8b); val t32 = math.min(t32a, t32b)
    println(f"THREADS t8=$t8%.2f t32=$t32%.2f speedup=${t8 / t32}%.2f eff=${t8 / t32 / 4}%.2f")
  }
}
