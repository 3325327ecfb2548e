package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Warc

/** revisit records + payload-deduplicated archive emission. */
class WarcRevisitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val pages = Seq(
    ("http://a.example/x", "2017-01-01T00:00:00Z", "shared body"),
    ("http://b.example/y", "2017-01-02T00:00:00Z", "shared body"),
    ("http://c.example/z", "2017-01-03T00:00:00Z", "shared body"),
    ("http://d.example/u", "2017-01-01T12:00:00Z", "unique body")
  ).toDF("url", "date_iso", "body")

  test("revisit record: exact bytes of the identical-payload-digest profile") {
    val rec = Seq(1).toDF("i").select(Warc.revisitRecordCol(
      lit("http://b.example/y"), lit("2017-01-02T00:00:00Z"), lit("<id:2>"),
      lit("<id:1>"), lit("http://a.example/x"), lit("2017-01-01T00:00:00Z"),
      lit("sha256:abc")).as("r")).head().getString(0)
    val want = "WARC/1.0\r\n" +
      "WARC-Type: revisit\r\n" +
      "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n" +
      "WARC-Record-ID: <id:2>\r\n" +
      "WARC-Refers-To: <id:1>\r\n" +
      "WARC-Refers-To-Target-URI: http://a.example/x\r\n" +
      "WARC-Refers-To-Date: 2017-01-01T00:00:00Z\r\n" +
      "WARC-Date: 2017-01-02T00:00:00Z\r\n" +
      "WARC-Target-URI: http://b.example/y\r\n" +
      "WARC-Payload-Digest: sha256:abc\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 0\r\n" +
      "\r\n\r\n\r\n"
    assert(rec == want)
  }

  test("archiveDedup: first capture is the response, later ones revisit it") {
    val out = Warc.archiveDedupRecords(pages).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(out("http://a.example/x")._1 == "response")
    assert(out("http://b.example/y")._1 == "revisit")
    assert(out("http://c.example/z")._1 == "revisit")
    assert(out("http://d.example/u")._1 == "response")
    // the original's payload is stored once: revisits carry no body
    assert(out("http://a.example/x")._2.contains("shared body"))
    assert(!out("http://b.example/y")._2.contains("shared body"))
  }

  test("archiveDedup round-trips through the record parser with linkage") {
    val parsed = Warc.archiveDedupRecords(pages)
      .select(col("url"), graft.functions.Warc.parsedRecordCol(col("record"))
        .as("p"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    val orig = parsed("http://a.example/x")
    val rev = parsed("http://c.example/z")
    assert(orig.getAs[String]("warc_type") == "response")
    assert(rev.getAs[String]("warc_type") == "revisit")
    assert(rev.getAs[Long]("content_length") == 0L)
    assert(rev.getAs[String]("body") == "")
    // pointer equals the elected original's record id, uri, and date
    assert(rev.getAs[Map[String, String]]("headers")("WARC-Refers-To") ==
      orig.getAs[String]("record_id"))
    assert(rev.getAs[Map[String, String]]("headers")("WARC-Refers-To-Target-URI")
      == "http://a.example/x")
    assert(rev.getAs[Map[String, String]]("headers")("WARC-Refers-To-Date")
      == "2017-01-01T00:00:00Z")
    // digest matches the shared payload
    val dig = java.security.MessageDigest.getInstance("SHA-256")
      .digest("shared body".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rev.getAs[Map[String, String]]("headers")("WARC-Payload-Digest")
      == s"sha256:$dig")
  }

  test("same-second re-fetches: distinct payloads get distinct record ids," +
      " identical captures collapse to one row") {
    val clash = Seq(
      ("http://a/x", "2017-01-01T00:00:00Z", "payload one"),
      ("http://a/x", "2017-01-01T00:00:00Z", "payload two"), // same url+date
      ("http://a/x", "2017-01-01T00:00:00Z", "payload one")  // exact dup row
    ).toDF("url", "date_iso", "body")
    val out = Warc.archiveDedupRecords(clash)
      .select(col("record_type"),
        Warc.parsedRecordCol(col("record")).getField("record_id").as("rid"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 2) // the byte-identical duplicate capture collapsed
    assert(out.map(_._1).sorted.toSeq == Seq("response", "response"))
    assert(out.map(_._2).distinct.length == 2) // no WARC-Record-ID collision
  }

  test("archiveDedup emits identical bytes at any parallelism") {
    def runAt(n: Int): Seq[String] =
      Warc.archiveDedupRecords(pages.repartition(n))
        .orderBy("url").collect().map(_.getString(3)).toSeq
    assert(runAt(1) == runAt(8))
  }
}

/** The rest of the record-type family: request / resource / metadata /
  * continuation all parse back with their linkage headers intact. */
class WarcRecordFamilySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def parsed(rec: org.apache.spark.sql.Column) =
    Seq(1).toDF("i").select(Warc.parsedRecordCol(rec).as("p")).head()
      .getStruct(0)

  test("request record round-trips") {
    val p = parsed(Warc.requestRecordCol(lit("http://h/x"),
      lit("2017-01-01T00:00:00Z"), lit("<id:r>"), lit("GET /x HTTP/1.1")))
    assert(p.getAs[String]("warc_type") == "request")
    assert(p.getAs[String]("body") == "GET /x HTTP/1.1")
    assert(p.getAs[Map[String, String]]("headers")("Content-Type")
      == "application/http; msgtype=request")
  }

  test("resource record carries the payload content type") {
    val p = parsed(Warc.resourceRecordCol(lit("http://h/f.css"),
      lit("2017-01-01T00:00:00Z"), lit("<id:s>"), lit("text/css"),
      lit("body { }")))
    assert(p.getAs[String]("warc_type") == "resource")
    assert(p.getAs[Map[String, String]]("headers")("Content-Type") == "text/css")
    assert(p.getAs[Long]("content_length") == 8L)
  }

  test("metadata record links via Refers-To and is typed warc-fields") {
    val p = parsed(Warc.metadataRecordCol(lit("http://h/x"),
      lit("2017-01-01T00:00:00Z"), lit("<id:m>"), lit("<id:r>"),
      lit("via: http://seed/")))
    assert(p.getAs[String]("warc_type") == "metadata")
    assert(p.getAs[Map[String, String]]("headers")("WARC-Refers-To") == "<id:r>")
    assert(p.getAs[Map[String, String]]("headers")("Content-Type")
      == "application/warc-fields")
  }

  test("continuation record carries segment origin and number") {
    val p = parsed(Warc.continuationRecordCol(lit("http://h/big"),
      lit("2017-01-01T00:00:00Z"), lit("<id:c>"), lit("<id:orig>"), lit(2),
      lit("tail-bytes")))
    assert(p.getAs[String]("warc_type") == "continuation")
    val h = p.getAs[Map[String, String]]("headers")
    assert(h("WARC-Segment-Origin-ID") == "<id:orig>")
    assert(h("WARC-Segment-Number") == "2")
    assert(!h.contains("Content-Type")) // continuations carry none (§5.20)
    assert(p.getAs[String]("body") == "tail-bytes")
  }
}
