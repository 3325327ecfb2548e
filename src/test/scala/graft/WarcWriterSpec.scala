package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Warc
import graft.sources.{WarcReader, WarcWriter}

class WarcWriterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixture = (0 until 10).map { i =>
    (s"http://w.example.com/$i", "2017-01-01T00:00:00Z", s"<urn:rec:$i>",
      (s"body $i with ünïcode and\r\n\r\nblank lines " + "x" * i).getBytes(UTF_8))
  }.toDF("url", "date_iso", "record_id", "body")

  test("responseRecordBytes matches the writer column byte for byte") {
    val viaCol = fixture
      .select(Warc.responseRecordCol($"url", $"date_iso", $"record_id",
        $"body".cast("string")).as("rec"), $"url")
      .orderBy("url").as[(String, String)].collect().map(_._1)
    val viaBytes = fixture
      .select($"url", $"date_iso", $"record_id", $"body")
      .orderBy("url").collect()
      .map(r => new String(WarcWriter.responseRecordBytes(
        r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3)), UTF_8))
    assert(viaCol.toSeq == viaBytes.toSeq)
  }

  test("segments + cdx round trip: point reads, indexed reads, full scans") {
    val dir = SparkTestBase.tempDir("warcw")
    val idx = WarcWriter.writeSegments(fixture.repartition(3), dir)
    val entries = idx.collect()
    assert(entries.length == 10)
    assert(entries.map(_.warc_file).distinct.length == 3)
    // offsets begin at 0 per file and lengths tile the file exactly
    entries.groupBy(_.warc_file).foreach { case (f, es) =>
      val sorted = es.sortBy(_.offset)
      assert(sorted.head.offset == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.offset + a.length == b.offset)
        case _           =>
      }
      val fileLen = new java.io.File(new java.net.URI(f).getPath).length
      assert(sorted.last.offset + sorted.last.length == fileLen)
    }
    // point read: one record, one byte range
    val e = entries.find(_.url.endsWith("/7")).get
    val rec = WarcWriter.fetch(spark.sparkContext.hadoopConfiguration,
      e.warc_file, e.offset, e.length)
    assert(rec.target_uri == "http://w.example.com/7")
    assert(new String(rec.body, UTF_8).startsWith("body 7 with ünïcode"))
    // distributed indexed read returns every record exactly once
    val all = WarcWriter.readIndexed(idx.toDF()).collect()
    assert(all.map(_.target_uri).sorted.toSeq ==
      (0 until 10).map(i => s"http://w.example.com/$i").sorted)
    // whole-segment scan (concatenated gzip members) sees the same records
    val scanned = WarcReader.read(spark, dir).collect()
    assert(scanned.count(_.warc_type == "response") == 10)
    assert(scanned.map(_.target_uri).sorted.toSeq ==
      all.map(_.target_uri).sorted.toSeq)
    // no .inprogress residue
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains("inprogress")))
  }
}
