package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** WARC/1.0 record emission (S5) — the full record serialization, not just
  * the projection: version line, typed header fields, blank line, content
  * block, double-CRLF terminator, exactly as the reference's writer frames
  * records (/root/reference/vendor/github.com/datatogether/warc/writer.go:
  * 20-46 — version + fields + CRLF, block + 2xCRLF; response record fields
  * per record.go:87-135). Empty fields are skipped (writer.go:66-69).
  *
  * Determinism deviation (documented): the reference writes header fields
  * in Go map iteration order — randomized per process. We emit the fields
  * in the WARC-spec's customary fixed order (Record-ID, Date, Target-URI,
  * Content-Type, Content-Length), so identical inputs produce identical
  * bytes at any parallelism.
  *
  * Everything is Spark built-ins (concat/length casts) — codegen'd,
  * UDF-free, so a 100 TB archive emit stays inside WholeStageCodegen.
  */
object Warc {

  private val CRLF = "\r\n"

  private def field(key: String, value: Column): Column =
    when(value.isNull || value === "", lit(""))
      .otherwise(concat(lit(key + ": "), value, lit(CRLF)))

  /** One WARC response record as a string column. `body` is the raw
    * captured content (the HTTP payload block); Content-Length counts its
    * BYTES (octet_length), never characters. */
  def responseRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: response" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Type", lit("application/http; msgtype=response")),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** Parse ONE WARC record held in a string column back into a struct
    * (version, warc_type, headers map, content_length, body) — the inverse
    * of `responseRecordCol`, all Spark built-ins (substring_index /
    * str_to_map / substr arithmetic), so a trillion-record parse stays
    * inside WholeStageCodegen with no UDF.
    *
    * Scope: a SINGLE record per value, body recovered as everything
    * between the first blank line and the trailing 2xCRLF — character
    * arithmetic, which is exact for any body (including bodies that
    * contain `\r\n\r\n`). Byte-true Content-Length framing over
    * multi-record archive FILES is `sources/WarcReader` — this column is
    * the engine-side parse for records already isolated in a column (the
    * shape S5 emits and the reader's `body` decodes to). */
  def parsedRecordCol(rec: Column): Column = {
    val headerBlock = substring_index(rec, CRLF + CRLF, 1)
    val version = substring_index(headerBlock, CRLF, 1)
    // header lines after the version line -> map (k: v per CRLF line)
    val hdrs = str_to_map(
      headerBlock.substr(length(version) + lit(3), length(headerBlock)),
      lit("\r\n"), lit(": "))
    val rest = rec.substr(length(headerBlock) + lit(5), length(rec))
    val body = rest.substr(lit(1), length(rest) - lit(4))
    struct(
      version.as("version"),
      hdrs.getItem("WARC-Type").as("warc_type"),
      hdrs.getItem("WARC-Target-URI").as("target_uri"),
      hdrs.getItem("WARC-Record-ID").as("record_id"),
      hdrs.getItem("Content-Length").cast("long").as("content_length"),
      hdrs.as("headers"),
      body.as("body"))
  }

  /** WET-style `conversion` record (the WARC→WET shape of a Common-Crawl
    * text-extraction pass; record types per the reference's
    * vendor/github.com/datatogether/warc/record.go:87-135 — `conversion`
    * is the same framing with WARC-Refers-To linking back to the source
    * response record, WARC/1.0 §6.8). Body is the EXTRACTED text, typed
    * text/plain; same fixed field order + framing as [[responseRecordCol]],
    * all built-ins, so a full-archive WET emit stays in WholeStageCodegen. */
  def conversionRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      refersTo: Column, body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: conversion" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Refers-To", refersTo),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Type", lit("text/plain")),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** `revisit` record, identical-payload-digest profile (WARC/1.0 §6.7.2;
    * record type per the reference's vendor/github.com/datatogether/warc/
    * record.go:87-135): the archive-dedup record a crawler writes when a
    * re-fetch returns a payload whose digest it has already stored —
    * instead of the payload, the record carries the digest plus a
    * three-field pointer (Refers-To id / Target-URI / Date) at the
    * ORIGINAL capture. Body is empty (Content-Length: 0); a 100 TB archive
    * with heavy recrawl stores each payload once. All built-ins. */
  def revisitRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      refersTo: Column, refersToUri: Column, refersToDate: Column,
      payloadDigest: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: revisit" + CRLF),
      lit("WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
        "identical-payload-digest" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Refers-To", refersTo),
      field("WARC-Refers-To-Target-URI", refersToUri),
      field("WARC-Refers-To-Date", refersToDate),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("WARC-Payload-Digest", payloadDigest),
      field("Content-Type", lit("application/http; msgtype=response")),
      lit("Content-Length: 0" + CRLF),
      lit(CRLF + CRLF + CRLF))

  /** Payload-deduplicated archive emission — the pass a recrawling archive
    * runs before writing segments (the Heritrix/Common-Crawl dedup model):
    * the FIRST capture of each distinct payload (by capture date, then url)
    * becomes a full `response` record; every later capture of the same
    * bytes becomes a `revisit` record pointing at it. Input
    * `(url, date_iso, body)`; output `(url, date_iso, record_type, record)`
    * — one row per DISTINCT capture (url, date_iso, payload):
    * byte-identical re-reads of the same capture collapse to one row, so
    * the output can be smaller than the input.
    *
    * Scale shape: ONE digest-keyed shuffle serves both the first-capture
    * election and the pointer fields (rank + first-struct over the same
    * window — a single exchange in the plan); record framing is the
    * codegen'd [[responseRecordCol]]/[[revisitRecordCol]] built-ins. Bodies
    * cross the digest shuffle once (they must: the elected original's body
    * is written); a heavy-recrawl corpus leaves with each payload stored
    * once. Record ids are deterministic digests of (url, date, payload
    * digest) — distinct captures can never collide on an id even when a
    * url is re-fetched within one date_iso tick with different bytes, and
    * byte-identical re-reads of the same capture collapse to ONE row
    * before the election (so a revisit can never point at its own id) —
    * re-runs and resumes emit byte-identical archives. */
  def archiveDedupRecords(pages: DataFrame): DataFrame = {
    val digest = sha2(col("body").cast("binary"), 256)
    val w = Window.partitionBy("digest").orderBy(col("date_iso"), col("url"))
    pages
      .select(col("url"), col("date_iso"), col("body"), digest.as("digest"))
      .dropDuplicates("url", "date_iso", "digest")
      .withColumn("record_id", concat(lit("<urn:sha256:"),
        sha2(concat_ws("|", col("url"), col("date_iso"), col("digest"))
          .cast("binary"), 256),
        lit(">")))
      .withColumn("rn", row_number().over(w))
      .withColumn("orig",
        first(struct(col("record_id"), col("url"), col("date_iso"))).over(w))
      .select(col("url"), col("date_iso"),
        when(col("rn") === 1, lit("response")).otherwise(lit("revisit"))
          .as("record_type"),
        when(col("rn") === 1,
          responseRecordCol(col("url"), col("date_iso"), col("record_id"),
            col("body")))
        .otherwise(
          revisitRecordCol(col("url"), col("date_iso"), col("record_id"),
            col("orig.record_id"), col("orig.url"), col("orig.date_iso"),
            concat(lit("sha256:"), col("digest"))))
        .as("record"))
  }

  /** `request` record (record.go:179-225): the scheme-specific request
    * that produced a response capture, typed application/http
    * msgtype=request. Completes a request/response capture pair. */
  def requestRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: request" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Type", lit("application/http; msgtype=request")),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** `resource` record (record.go:103-178): a resource captured without
    * full protocol response information (data dumps, file imports, the
    * blob-sink side of S4); `contentType` types the payload itself. */
  def resourceRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      contentType: Column, body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: resource" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Type", contentType),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** `metadata` record (record.go:226-279): warc-fields content describing
    * another record (harvest context, seed provenance), linked via
    * WARC-Refers-To. */
  def metadataRecordCol(targetUri: Column, dateIso: Column, recordId: Column,
      refersTo: Column, body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: metadata" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Refers-To", refersTo),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Type", lit("application/warc-fields")),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** `continuation` record (record.go:360-407): a later segment of a
    * record split across WARC files — WARC-Segment-Origin-ID names the
    * first segment's record id, WARC-Segment-Number is >= 2 (§5.20). */
  def continuationRecordCol(targetUri: Column, dateIso: Column,
      recordId: Column, segmentOriginId: Column, segmentNumber: Column,
      body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: continuation" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Segment-Origin-ID", segmentOriginId),
      field("WARC-Segment-Number", segmentNumber.cast("string")),
      field("WARC-Date", dateIso),
      field("WARC-Target-URI", targetUri),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))

  /** warcinfo file-header record (record.go:47-84). */
  def warcInfoRecordCol(recordId: Column, dateIso: Column,
      filename: Column, body: Column): Column =
    concat(
      lit("WARC/1.0" + CRLF),
      lit("WARC-Type: warcinfo" + CRLF),
      field("WARC-Record-ID", recordId),
      field("WARC-Date", dateIso),
      field("WARC-Filename", filename),
      field("Content-Type", lit("application/warc-fields")),
      field("Content-Length", octet_length(body).cast("string")),
      lit(CRLF), body, lit(CRLF + CRLF))
}
