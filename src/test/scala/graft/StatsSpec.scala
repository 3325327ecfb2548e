package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val emptyHash = graft.functions.Hashing.EmptyBodyHash

  test("per-source counts with content filters (A2/A3)") {
    val urls = Seq(
      ("http://a.com/x.pdf", "1220abc", "application/pdf"),
      ("http://a.com/y.html", "1220def", "text/html; charset=utf-8"),
      ("http://a.com/z.css", "", ""),          // no hash -> not content
      ("http://b.org/w.pdf", emptyHash, ""),   // empty-body hash -> not content
      ("http://b.org/v.csv", "1220xyz", "text/csv")
    ).toDF("url", "hash", "content_sniff")
    val sources = Seq(
      ("s1", "a.com", "p1"), ("s2", "b.org", "p2")
    ).toDF("id", "url", "primer_id")

    val counts = Stats.sourceCounts(urls, sources).collect()
      .map(r => r.getAs[String]("source_id") ->
        (r.getAs[Long]("url_count"), r.getAs[Long]("content_url_count"))).toMap
    assert(counts("s1") == (3L, 1L)) // only x.pdf is content
    assert(counts("s2") == (2L, 1L)) // only v.csv
  }

  test("recursive primer rollup over a 3-level tree (A5)") {
    // tree: root <- mid <- leaf ; sources attach at every level
    val primers = Seq(
      ("root", null.asInstanceOf[String]), ("mid", "root"), ("leaf", "mid"),
      ("other", null.asInstanceOf[String])
    ).toDF("id", "parent_id")
    val perSource = Seq(
      ("sA", "root", 10L, 1L, 0L),
      ("sB", "mid", 20L, 2L, 0L),
      ("sC", "leaf", 40L, 4L, 0L),
      ("sD", "other", 7L, 7L, 0L)
    ).toDF("source_id", "primer_id", "url_count", "content_url_count",
      "content_metadata_count")

    val rolled = Stats.primerRollup(primers, perSource).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("url_count")).toMap
    assert(rolled("leaf") == 40L)
    assert(rolled("mid") == 60L)   // 20 + 40
    assert(rolled("root") == 70L)  // 10 + 20 + 40
    assert(rolled("other") == 7L)
  }
}
