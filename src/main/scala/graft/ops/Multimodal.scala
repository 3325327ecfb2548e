package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata.
  *
  * The Spark-side layout is real — schema, batched per-partition processing,
  * deterministic partitioning. Image decode is REAL (JDK javax.imageio
  * header read: png/jpeg/gif/bmp width/height); audio/video metadata is a
  * declared deterministic STUB (no AV codecs in this container) — swapping
  * in a real prober is a drop-in replacement of `avStub` inside the same
  * mapPartitions batch loop (the JVM analogue of mapInPandas batches).
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, duration_ms: Long, n_bytes: Long)

  final case class MediaRow(media_id: Long, content: Array[Byte])
  final case class DecodedRow(media_id: Long, format: String, width: Int,
      height: Int, duration_ms: Long, n_bytes: Long, feature: Array[Float])

  /** Decoder: REAL header decode for image formats the JDK ships codecs for
    * (png/jpeg/gif/bmp via javax.imageio — width/height read from the image
    * header only, no full raster decode, so cost per row is O(header), not
    * O(pixels)); audio/video metadata remains a declared deterministic STUB
    * (this container ships no AV codecs — swap `avStub` for a real probe). */
  def decode(bytes: Array[Byte]): MediaMeta = {
    val sniffed = graft.functions.Sniff.detectContentType(bytes)
    val fmt = sniffed match {
      case s if s.startsWith("image/") => s.stripPrefix("image/")
      case s if s.startsWith("audio/") => s.stripPrefix("audio/")
      case s if s.startsWith("video/") => s.stripPrefix("video/")
      case _                           => "unknown"
    }
    val n = if (bytes == null) 0 else bytes.length
    if (sniffed.startsWith("image/")) {
      // corrupt/truncated bytes are the norm in crawled media: a failed
      // header parse degrades to (0,0) dims, never a task failure
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(iis)
              MediaMeta(fmt, r.getWidth(0), r.getHeight(0), 0L, n.toLong)
            } finally r.dispose()
          } else MediaMeta(fmt, 0, 0, 0L, n.toLong) // no JDK codec for this format
        } finally if (iis != null) iis.close()
      } catch {
        case _: java.io.IOException | _: RuntimeException =>
          MediaMeta(fmt, 0, 0, 0L, n.toLong)
      }
    } else if (sniffed.startsWith("audio/") || sniffed.startsWith("video/")) {
      avStub(fmt, n)
    } else MediaMeta(fmt, 0, 0, 0L, n.toLong)
  }

  /** STUB A/V metadata — deterministic fake duration from byte length;
    * ??? a real container probe (mp4 moov / ogg pages) goes here. */
  private def avStub(fmt: String, n: Int): MediaMeta =
    MediaMeta(fmt, 0, 0, n.toLong * 8, n.toLong)

  @deprecated("use decode — kept for round-1 spec compatibility", "r2")
  def decodeStub(bytes: Array[Byte]): MediaMeta = decode(bytes)

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
        val m = decode(row.content)
        DecodedRow(row.media_id, m.format, m.width, m.height, m.duration_ms,
          m.n_bytes, featureStub(row.content))
      }
    }
  }

  /** Column-level variant for DataFrame pipelines. */
  val decodeMetaUdf = udf { (bytes: Array[Byte]) =>
    val m = decode(bytes)
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
