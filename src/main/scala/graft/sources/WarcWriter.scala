package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** WARC segment SINK with a cdx-style offset index — the write layout that
  * makes a 100 TB archive randomly accessible.
  *
  * Each record is compressed as its OWN GZIP MEMBER (gzip members are
  * self-delimiting), so any record can be served by a byte-range read of
  * (file, offset, length) and decompressed alone — the Common Crawl
  * layout, and the reason it ships cdx index files next to its segments.
  * Concatenated members still stream as one file through standard gzip
  * readers, so `WarcReader.read` scans whole segments with the same code
  * path that reads single-member files.
  *
  * Scale shape: one segment file per input partition, written in input
  * order by a single sequential pass (no driver involvement, no shuffle —
  * the caller picks partition count/size via repartition). The returned
  * INDEX (url, warc_file, offset, length) is the only thing that crosses
  * back into Spark — narrow rows, one per record — and persists as the cdx
  * table that point reads and splittable rescans key off.
  *
  * Fault model: a segment is written to `<name>.inprogress` and renamed on
  * partition success, so a retried task never leaves a half segment under
  * the final name; the index rows are the task's output and re-emit on
  * retry with the rewritten file (Spark's task-commit semantics dedup the
  * winning attempt).
  *
  * Record framing matches `functions/Warc.responseRecordCol` byte for byte
  * (spec-asserted), completing writer-column / file-sink / reader parity.
  */
object WarcWriter {

  /** cdx index row: where one record lives. */
  case class CdxEntry(url: String, warc_file: String, offset: Long,
      length: Long, record_id: String)

  private val CRLF = "\r\n"

  /** The exact bytes `Warc.responseRecordCol` emits for one record. */
  private[graft] def responseRecordBytes(url: String, dateIso: String,
      recordId: String, body: Array[Byte]): Array[Byte] = {
    def field(k: String, v: String): String =
      if (v == null || v.isEmpty) "" else s"$k: $v$CRLF"
    val header = "WARC/1.0" + CRLF +
      "WARC-Type: response" + CRLF +
      field("WARC-Record-ID", recordId) +
      field("WARC-Date", dateIso) +
      field("WARC-Target-URI", url) +
      field("Content-Type", "application/http; msgtype=response") +
      field("Content-Length", body.length.toString) +
      CRLF
    val out = new ByteArrayOutputStream(header.length + body.length + 4)
    out.write(header.getBytes(UTF_8))
    out.write(body)
    out.write((CRLF + CRLF).getBytes(UTF_8))
    out.toByteArray
  }

  private def gzipMember(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(raw); gz.finish(); gz.close()
    out.toByteArray
  }

  /** Write (url, dateIso, recordId, body) rows as `.warc.gz` segments under
    * `outDir`, one file per partition, one gzip member per record. Returns
    * the cdx index; `spark.read`-ing it back and calling `fetch` serves any
    * record without touching the rest of its segment. */
  def writeSegments(df: DataFrame, outDir: String,
      urlCol: String = "url", dateCol: String = "date_iso",
      idCol: String = "record_id", bodyCol: String = "body"): Dataset[CdxEntry] = {
    val spark = df.sparkSession
    import spark.implicits._
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val staged = df.select(df(urlCol).cast("string"), df(dateCol).cast("string"),
        df(idCol).cast("string"), df(bodyCol).cast("binary"))
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val pid = TaskContext.getPartitionId()
          val name = f"segment-$pid%05d.warc.gz"
          val finalPath = new Path(outDir, name)
          // attempt-unique staging name: with speculation/zombie retries two
          // attempts of the same partition write CONCURRENTLY, and a shared
          // tmp path could publish the slower attempt's half-written bytes
          // under the final name. With unique tmp names the last rename
          // always publishes a COMPLETE segment (attempts are deterministic,
          // so competing complete segments are byte-identical).
          val attempt = Option(TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmpPath = new Path(outDir, name + s".inprogress-$attempt")
          val fs = finalPath.getFileSystem(serConf.value)
          val out = fs.create(tmpPath, true)
          var offset = 0L
          val entries = scala.collection.mutable.ArrayBuffer.empty[CdxEntry]
          it.foreach { row =>
            val member = gzipMember(responseRecordBytes(
              row.getString(0), row.getString(1), row.getString(2),
              Option(row.getAs[Array[Byte]](3)).getOrElse(Array.emptyByteArray)))
            out.write(member)
            entries += CdxEntry(row.getString(0), finalPath.toString,
              offset, member.length.toLong, row.getString(2))
            offset += member.length
          }
          out.close()
          // overwrite semantics: a re-run (task retry) replaces the segment
          if (fs.exists(finalPath)) fs.delete(finalPath, false)
          fs.rename(tmpPath, finalPath)
          entries.iterator
        }
      }
    // the write is a SIDE EFFECT of computing the index: materialize it
    // exactly once (eager localCheckpoint), so downstream actions replay
    // the checkpointed index instead of re-writing every segment
    staged.localCheckpoint(true)
  }

  /** Point read: fetch exactly ONE record by its cdx coordinates — a
    * byte-range read of `length` bytes at `offset`, one gzip member. */
  def fetch(conf: org.apache.hadoop.conf.Configuration,
      file: String, offset: Long, length: Long): WarcReader.WarcRecord = {
    val p = new Path(file)
    val in = p.getFileSystem(conf).open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](length.toInt)
      in.readFully(buf)
      WarcReader.recordIterator(file,
        new GZIPInputStream(new java.io.ByteArrayInputStream(buf))).next()
    } finally in.close()
  }

  /** Distributed point reads: resolve every cdx row to its record — seek
    * reads only, never a segment scan. The shape that re-hydrates an
    * arbitrary url subset (a dedup-survivor list, a recrawl delta) out of
    * a 100 TB archive while reading only the touched byte ranges. */
  def readIndexed(index: DataFrame): Dataset[WarcReader.WarcRecord] = {
    val spark = index.sparkSession
    import spark.implicits._
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    index.select(index("warc_file").cast("string"),
        index("offset").cast("long"), index("length").cast("long"))
      .mapPartitions { it =>
        it.map { row =>
          fetch(serConf.value, row.getString(0), row.getLong(1), row.getLong(2))
        }
      }
  }
}
