package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.crawl.Fixtures
import graft.functions.Funcs

/** Scaling diagnostic: times each kernel phase separately at two
  * parallelism levels to locate the non-scaling stage. */
object BenchDiag {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"diag-$cpus")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def phases(spark: SparkSession): Map[String, Double] = {
    import spark.implicits._
    val cfg = Fixtures.ScaleConfig(hosts = 2048, pagesPerHost = 512,
      outDegree = 16, partitions = 128)
    val pages = Fixtures.scaleSitePages(spark, cfg).toDF()
      .persist(StorageLevel.MEMORY_AND_DISK)
    pages.count()

    def time(label: String)(f: => Unit): (String, Double) = {
      f // warm
      val t0 = System.nanoTime(); f; (label, (System.nanoTime() - t0) / 1e9)
    }

    val out = Seq(
      time("gen_count") { pages.count(); () },
      time("map_sniff_title_hash") {
        pages.select(Funcs.sniffUdf($"html").as("s"),
          Funcs.titleUdf($"html").as("t"),
          Funcs.multihash($"html").as("h"))
          .agg(count($"s"), count($"t"), max(length($"h"))).head(); ()
      },
      time("map_extract_links") {
        pages.select(posexplode(Funcs.extractLinksUdf($"url", $"html"))
          .as(Seq("i", "d"))).agg(count($"d")).head(); ()
      },
      time("sha_only") {
        pages.select(Funcs.multihash($"html").as("h"))
          .agg(max(length($"h"))).head(); ()
      },
      time("shuffle_distinct_anti") {
        val links = pages.select(posexplode(Funcs.extractLinksUdf($"url", $"html"))
          .as(Seq("i", "dst")))
        links.select($"dst".as("url")).distinct()
          .join(pages.select($"url"), Seq("url"), "left_anti").count(); ()
      },
      time("self_join_url") {
        pages.select($"url", Funcs.hostUdf($"url").as("host"))
          .join(pages.select("url", "html"), Seq("url")).count(); ()
      }
    ).toMap
    pages.unpersist()
    out
  }

  def main(args: Array[String]): Unit = {
    val results = Seq(32, 8).map { c =>
      val s = session(c)
      try c -> phases(s) finally s.stop()
    }
    val keys = results.head._2.keys.toSeq.sorted
    println(f"${"phase"}%-24s ${"t8"}%8s ${"t32"}%8s ${"speedup"}%8s ${"eff"}%6s")
    keys.foreach { k =>
      val t8 = results(1)._2(k); val t32 = results(0)._2(k)
      println(f"$k%-24s $t8%8.2f $t32%8.2f ${t8 / t32}%8.2f ${t8 / t32 / 4}%6.2f")
    }
  }
}
