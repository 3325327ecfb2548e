package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** WARC/1.0 file SOURCE — the read side of `functions/Warc.scala`'s writer.
  *
  * A web-archive corpus (Common-Crawl layout) arrives as many ~1 GB
  * `.warc(.gz)` segment files. WARC records are Content-Length framed: the
  * payload block may itself contain `\r\n\r\n` or even a literal
  * `WARC/1.0` line (an archived page quoting a WARC record), so records
  * CANNOT be recovered by delimiter splitting — only by a sequential scan
  * that honors each record's Content-Length. That fixes the parallelism
  * model at 100 TB:
  *
  *   - ACROSS files: one task per segment file (a 100 TB crawl is ~10^5
  *     segments — ample parallelism for any executor count).
  *   - WITHIN a file: inherently sequential. Record-level gzip members
  *     would allow mid-file splits, but only with an external offset index
  *     (Common Crawl ships cdx indexes for exactly this reason); absent an
  *     index, streaming the segment is the honest baseline.
  *
  * Records stream lazily off the open file (an iterator over a bounded
  * read buffer) — a segment is never buffered whole, so memory per task is
  * O(largest single record), not O(file). `.gz` segments decompress
  * through GZIPInputStream, which natively continues across concatenated
  * gzip members — both whole-file gzip and the record-per-member layout
  * Common Crawl uses decode with the same code path.
  *
  * Reference shape: the reference WRITES archives (vendored
  * datatogether/warc writer.go) but never reads them back; the reader
  * completes the round trip so an archive emitted by S5 is a first-class
  * input table. Parsing follows the same framing the writer emits
  * (version line, header fields, CRLF, block, 2xCRLF).
  */
object WarcReader {

  /** One parsed record. `body` is the raw payload block, byte-true (the
    * Content-Length octets exactly as archived — undecoded; charset is the
    * payload's business). `headers` excludes the version line. */
  case class WarcRecord(
      warc_file: String,
      record_no: Long,
      version: String,
      warc_type: String,
      target_uri: String,
      record_id: String,
      content_length: Long,
      headers: Map[String, String],
      body: Array[Byte])

  /** Read every `.warc` / `.warc.gz` under `dir` (non-recursive glob of a
    * directory, or a single file path). One input partition per file. */
  def read(spark: SparkSession, dir: String): Dataset[WarcRecord] = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isFile) Seq(p.toString)
      else fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
        .filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz"))
        .sorted
    // one task per segment file: the scan inside a file is sequential by
    // construction (Content-Length framing), parallelism comes from the
    // file count — the Common-Crawl processing shape
    val paths = spark.createDataset(files).repartition(math.max(files.size, 1))
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    paths.mapPartitions { it =>
      it.flatMap { file =>
        val fp = new Path(file)
        val stream = fp.getFileSystem(serConf.value).open(fp)
        val in: InputStream =
          if (file.endsWith(".gz")) new GZIPInputStream(stream, 1 << 16)
          else new BufferedInputStream(stream, 1 << 16)
        // the iterator closes at natural EOF, but a limit()/take()/failed
        // task abandons it mid-file — close on task completion so partially
        // consumed segments never leak a file handle (close is idempotent)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => () }
          }
        recordIterator(file, in)
      }
    }
  }

  /** Lazy record iterator over an open stream; closes the stream at EOF. */
  private[graft] def recordIterator(file: String, in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var recNo = 0L
      private var closed = false
      advance()

      private def advance(): Unit = {
        nextRec = null
        if (closed) return
        // skip inter-record blank lines until a version line or EOF
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { in.close(); closed = true; return }
        if (!line.startsWith("WARC/"))
          throw new IllegalStateException(
            s"$file: expected WARC version line at record $recNo, got '$line'")
        val version = line
        val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) hdrs += h.substring(0, i).trim -> h.substring(i + 1).trim
          h = readLine(in)
        }
        val clen = hdrs.getOrElse("Content-Length",
          throw new IllegalStateException(s"$file: record $recNo has no Content-Length")).toLong
        val body = readFully(in, clen, file)
        nextRec = WarcRecord(file, recNo, version,
          hdrs.getOrElse("WARC-Type", ""), hdrs.getOrElse("WARC-Target-URI", ""),
          hdrs.getOrElse("WARC-Record-ID", ""), clen, hdrs.toMap, body)
        recNo += 1
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Read one CRLF-terminated header line as ISO-8859-1 (WARC headers are
    * octets; 8859-1 maps them 1:1). Returns null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, "ISO-8859-1")
  }

  private def readFully(in: InputStream, n: Long, file: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$file: record block over 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r < 0) throw new EOFException(s"$file: truncated record block ($off of $n bytes)")
      off += r
    }
    out
  }
}
