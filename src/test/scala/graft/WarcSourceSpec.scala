package graft

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Warc
import graft.sources.WarcReader

/** WARC reader: Content-Length-framed sequential parse over segment files
  * (plain + gzip), and the built-in single-record column parser. The
  * adversarial bodies embed `\r\n\r\n` and a literal `WARC/1.0` line —
  * exactly what breaks any delimiter-split parse. */
class WarcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // bodies: multi-byte UTF-8, embedded blank lines, an embedded fake record
  private val bodies = Seq(
    "hello world",
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>body über naïve</html>",
    "quoting an archive:\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nnot a real record",
    "")

  /** Serialize records with the engine's own writer column. */
  private def recordBytes: Array[Byte] = {
    import spark.implicits._
    val df = bodies.zipWithIndex.toDF("body", "i")
    val recs = df.orderBy("i").select(Warc.responseRecordCol(
      concat(lit("http://w.example.com/"), col("i")),
      lit("2017-01-01T00:00:00Z"),
      concat(lit("<urn:rec:"), col("i"), lit(">")),
      col("body")).as("rec")).as[String].collect()
    val info = spark.range(1).select(Warc.warcInfoRecordCol(
      lit("<urn:info:0>"), lit("2017-01-01T00:00:00Z"),
      lit("seg-00000.warc"), lit("software: graft\r\n")).as("rec"))
      .as[String].head()
    (info +: recs.toSeq).mkString.getBytes(UTF_8)
  }

  test("recordIterator round-trips adversarial bodies byte-true") {
    val recs = WarcReader.recordIterator("mem",
      new ByteArrayInputStream(recordBytes)).toSeq
    assert(recs.size === bodies.size + 1)
    assert(recs.head.warc_type === "warcinfo")
    val resp = recs.tail
    assert(resp.map(_.warc_type).distinct === Seq("response"))
    resp.zipWithIndex.foreach { case (r, i) =>
      assert(r.target_uri === s"http://w.example.com/$i")
      assert(r.record_id === s"<urn:rec:$i>")
      assert(new String(r.body, UTF_8) === bodies(i))
      assert(r.content_length === bodies(i).getBytes(UTF_8).length)
    }
  }

  test("read() scans plain and gzip segment files, one partition each") {
    val dir = SparkTestBase.tempDir("warcsrc")
    val bytes = recordBytes
    val f1 = new FileOutputStream(s"$dir/seg-a.warc")
    f1.write(bytes); f1.close()
    val gz = new GZIPOutputStream(new FileOutputStream(s"$dir/seg-b.warc.gz"))
    gz.write(bytes); gz.close()
    // a non-warc file must be ignored
    val junk = new FileOutputStream(s"$dir/README.txt")
    junk.write("not an archive".getBytes(UTF_8)); junk.close()

    val ds = WarcReader.read(spark, dir)
    val rows = ds.collect().toSeq
    assert(rows.size === 2 * (bodies.size + 1))
    assert(rows.map(_.warc_file).distinct.size === 2)
    // per-file record numbering restarts and bodies match across layouts
    val byFile = rows.groupBy(_.warc_file)
    byFile.values.foreach { recs =>
      val resp = recs.filter(_.warc_type == "response").sortBy(_.record_no)
      assert(resp.map(r => new String(r.body, UTF_8)) === bodies)
    }
    // headers map carries every emitted field
    val r1 = rows.find(r => r.warc_type == "response" && r.record_no == 1L).get
    assert(r1.headers("Content-Type") === "application/http; msgtype=response")
  }

  test("truncated record block fails loudly, not silently") {
    val bytes = recordBytes
    val cut = bytes.take(bytes.length - 30)
    val it = WarcReader.recordIterator("mem", new ByteArrayInputStream(cut))
    intercept[Exception] { it.toList }
  }

  test("parsedRecordCol inverts responseRecordCol on adversarial bodies") {
    import spark.implicits._
    val df = bodies.zipWithIndex.toDF("body", "i")
    val parsed = df.select(col("i"), col("body"),
      Warc.parsedRecordCol(Warc.responseRecordCol(
        concat(lit("http://w.example.com/"), col("i")),
        lit("2017-01-01T00:00:00Z"),
        concat(lit("<urn:rec:"), col("i"), lit(">")),
        col("body"))).as("p"))
    val rows = parsed.select("i", "body", "p.version", "p.warc_type",
      "p.target_uri", "p.body").collect()
    rows.foreach { r =>
      assert(r.getString(2) === "WARC/1.0")
      assert(r.getString(3) === "response")
      assert(r.getString(4) === s"http://w.example.com/${r.getInt(0)}")
      assert(r.getString(5) === r.getString(1)) // body round-trips
    }
  }
}
