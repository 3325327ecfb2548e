package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Metadata entity: sentry's hash-chained, key-signed metadata records
  * (core/metadata.go:30-45; table core/queries.go:202-210).
  *
  * Schema: (hash, time_stamp, key_id, subject, prev, meta, deleted) —
  * `subject` is the sha256 multihash of the content described, `prev` chains
  * to the previous metadata hash for the same author+subject, and the empty-
  * content sentinel hash marks metadata whose body hashed empty
  * (core/queries.go:236-244).
  *
  * All query shapes are single-pass window/agg plans keyed on `subject` or
  * `key_id` — at 100 TB the latest-per-subject is a partial top-1 window
  * (Spark 4 WindowGroupLimit pushes the rank filter below the exchange), and
  * the counts are map-side-combined hash aggregates.
  */
object Metadata {

  /** sha256 multihash of zero bytes — the reference's "empty content"
    * exclusion constant (core/queries.go:243). */
  val EmptyContentHash =
    "1220e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  /** qMetadataForSubject (queries.go:227-234): all live metadata for a
    * subject hash, non-deleted, non-null body. */
  def bySubject(meta: DataFrame, subject: Column): DataFrame =
    meta.filter(col("subject") === subject && !col("deleted") &&
        col("meta").isNotNull)
      .select("hash", "time_stamp", "key_id", "subject", "prev", "meta")

  /** qMetadataLatestForKey (queries.go:246-255): DISTINCT ON (subject)
    * latest entry per subject for one signing key, paginated by subject. */
  def latestForKey(meta: DataFrame, keyId: String, limit: Int,
      offset: Int): DataFrame = {
    val w = Window.partitionBy("subject").orderBy(desc("time_stamp"), desc("hash"))
    meta.filter(col("key_id") === keyId && !col("deleted"))
      .withColumn("rn_", row_number().over(w)).filter(col("rn_") === 1)
      .orderBy("subject")
      .select("hash", "time_stamp", "key_id", "subject", "prev", "meta")
      .offset(offset).limit(limit)
  }

  /** qMetadataCountForKey (queries.go:236-244): entries for a key, omitting
    * the empty-content sentinel. */
  def countForKey(meta: DataFrame, keyId: String): DataFrame =
    meta.filter(col("key_id") === keyId && col("hash") =!= EmptyContentHash)
      .agg(count(lit(1)).as("n"))

  /** Distinct subjects that have at least one live metadata record — the
    * semi-join side of the content+metadata count (A4; the reference's
    * qContentUrlsMetadataCount joins urls.hash to metadata.subject). */
  def subjectsWithMeta(meta: DataFrame): DataFrame =
    meta.filter(!col("deleted") && col("meta").isNotNull)
      .select("subject").distinct()

  /** A4: count of content rows that have live metadata — semi join on the
    * content multihash (subjects side is distinct → broadcastable when the
    * author set is small; otherwise a shuffled semi join on subject). */
  def contentWithMetadataCount(content: DataFrame, subjectCol: Column,
      meta: DataFrame): DataFrame =
    content.withColumn("subject_", subjectCol)
      .join(subjectsWithMeta(meta).withColumnRenamed("subject", "subject_"),
        Seq("subject_"), "left_semi")
      .agg(count(lit(1)).as("n_content_with_meta"))
}
