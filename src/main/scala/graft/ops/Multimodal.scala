package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side layout is real — schema, batched per-partition processing,
  * deterministic partitioning — while the actual media decode is STUBBED
  * (this container ships no image/audio codecs): `decodeStub` derives fake
  * but deterministic metadata from the bytes (magic-number format sniff via
  * graft.functions.Sniff + byte-derived dimensions). Swapping in a real
  * decoder is a drop-in replacement of `decodeStub` inside the same
  * mapPartitions batch loop (the JVM analogue of mapInPandas batches).
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, duration_ms: Long, n_bytes: Long)

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class DecodedRow(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long, n_bytes: Long, feature: Array[Float])

  /** STUB decoder — deterministic fake: metadata from sniffed format and
    * byte statistics; replace with a real codec in production. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    val fmt = graft.functions.Sniff.detectContentType(bytes) match {
      case s if s.startsWith("image/") => s.stripPrefix("image/")
      case s if s.startsWith("audio/") => s.stripPrefix("audio/")
      case s if s.startsWith("video/") => s.stripPrefix("video/")
      case _                           => "unknown"
    }
    val n = if (bytes == null) 0 else bytes.length
    // ??? real decode goes here; fake dims derived from content length
    val w = if (n == 0) 0 else 64 + (n % 1024)
    val h = if (n == 0) 0 else 64 + ((n / 7) % 1024)
    MediaMeta(fmt, w.toInt, h.toInt, n.toLong * 8, n.toLong)
  }

  /** STUB feature extractor: fixed-size float vector from byte histogram —
    * the shape (batched, per-partition, fixed dim) is what matters. */
  def featureStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { out((bytes(i) & 0xff) % dim) += 1.0f; i += 1 }
      val n = math.max(1, bytes.length)
      var j = 0
      while (j < dim) { out(j) /= n; j += 1 }
    }
    out
  }

  /** Batched decode over partitions — mapPartitions keeps per-batch decoder
    * state (a real codec context) alive across rows, mirroring the
    * mapInPandas batch contract. */
  def decodeAll(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder context would be initialized here
      it.map { row =>
        val m = decodeStub(row.content)
        DecodedRow(row.media_id, m.format, m.width, m.height, m.duration_ms,
          m.n_bytes, featureStub(row.content))
      }
    }
  }

  /** Column-level variant for DataFrame pipelines. */
  val decodeMetaUdf = udf { (bytes: Array[Byte]) =>
    val m = decodeStub(bytes)
    (m.format, m.width, m.height, m.duration_ms, m.n_bytes)
  }

  /** Media metadata projection with binary stats — multihash id, sniffed
    * format, stub dimensions. */
  def mediaMeta(df: DataFrame, binaryCol: String): DataFrame =
    df.withColumn("media_hash",
        concat(lit("1220"), sha2(col(binaryCol), 256)))
      .withColumn("meta_", decodeMetaUdf(col(binaryCol)))
      .select(col("*"), col("meta_._1").as("format"), col("meta_._2").as("width"),
        col("meta_._3").as("height"), col("meta_._4").as("duration_ms"),
        col("meta_._5").as("n_bytes"))
      .drop("meta_")
}
