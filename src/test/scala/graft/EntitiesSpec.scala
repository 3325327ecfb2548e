package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.crawl.{Metadata, Collections, Uncrawlables}

/** Metadata / collections / uncrawlables entity query shapes
  * (core/metadata.go, core/collection.go, core/queries.go). */
class EntitiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // (hash, time_stamp, key_id, subject, prev, meta, deleted)
  private lazy val meta = Seq(
    ("h1", ts(10), "k1", "s1", "", """{"a":1}""", false),
    ("h2", ts(20), "k1", "s1", "h1", """{"a":2}""", false),
    ("h3", ts(30), "k1", "s1", "h2", null, false), // null body
    ("h4", ts(15), "k1", "s2", "", """{"b":1}""", true), // deleted
    ("h5", ts(25), "k1", "s2", "h4", """{"b":2}""", false),
    ("h6", ts(40), "k2", "s1", "", """{"c":1}""", false),
    (Metadata.EmptyContentHash, ts(50), "k2", "s3", "", """{}""", false)
  ).toDF("hash", "time_stamp", "key_id", "subject", "prev", "meta", "deleted")

  test("bySubject: live non-null metadata only (qMetadataForSubject)") {
    val rows = Metadata.bySubject(meta, lit("s1")).collect()
    assert(rows.map(_.getAs[String]("hash")).toSet == Set("h1", "h2", "h6"))
  }

  test("latestForKey: DISTINCT ON (subject) latest per subject") {
    val rows = Metadata.latestForKey(meta, "k1", limit = 10, offset = 0).collect()
    // s1 latest for k1 is h3 (ts 30, even with null meta — matches the
    // reference: qMetadataLatestForKey has no meta IS NOT NULL clause);
    // s2 latest non-deleted is h5
    assert(rows.map(r => r.getAs[String]("subject") -> r.getAs[String]("hash")).toMap ==
      Map("s1" -> "h3", "s2" -> "h5"))
  }

  test("countForKey excludes the empty-content sentinel") {
    assert(Metadata.countForKey(meta, "k2").head().getLong(0) == 1L)
    assert(Metadata.countForKey(meta, "k1").head().getLong(0) == 5L)
  }

  test("contentWithMetadataCount: semi join on subject") {
    val content = Seq(("s1"), ("s2"), ("sX")).toDF("subj")
    val n = Metadata.contentWithMetadataCount(content, col("subj"), meta)
      .head().getLong(0)
    assert(n == 2L) // s1 and s2 have live metadata; sX has none
  }

  test("collections: items join + order + pagination; lengths") {
    val items = Seq(
      ("c1", "u1", 2L, ""), ("c1", "u2", 0L, ""), ("c1", "u3", 1L, ""),
      ("c2", "u1", 0L, "")).toDF("collection_id", "url_id", "idx", "description")
    val urls = Seq(("u1", "http://a/", "A"), ("u2", "http://b/", "B"),
      ("u3", "http://c/", "C")).toDF("id", "url", "title")
    val page = Collections.items(items, urls, "c1", limit = 2, offset = 1).collect()
    assert(page.map(_.getAs[String]("url_id")).toSeq == Seq("u3", "u1"))
    val lens = Collections.lengths(items).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lens == Map("c1" -> 3L, "c2" -> 1L))
  }

  test("uncrawlables gate removes blocked urls") {
    val cands = Seq(("http://a/", 1), ("http://b/", 2)).toDF("url", "x")
    val unc = Seq(Tuple1("http://a/")).toDF("url")
    val out = Uncrawlables.gate(cands, unc).select("url").as[String].collect()
    assert(out.toSeq == Seq("http://b/"))
  }
}
