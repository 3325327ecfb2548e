package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed URL-seen set: per-partition Bloom filters merged through
  * Catalyst's partial/final aggregation tree (SURVEY §2.4 A9).
  *
  * Replaces sentry's in-memory `enqued` map + PK-upsert probe
  * (/root/reference/crawler.go:27-29, core/url.go:397-440) at frontier
  * scale: the bloom is a *prefilter* — no false negatives by construction —
  * so candidates it rejects are definitely-new and skip the exact probe;
  * only the "maybe seen"残 set pays the exact anti-join against the urls
  * table. At 10^10 urls a 1%-fpp filter is ~12 GB — shard by url-hash range
  * (one Bloom row per shard, same Aggregator, groupBy shard) and broadcast
  * only the shards a partition needs; the sandbox uses one shard.
  *
  * The build is a typed Aggregator (Dataset-native, no RDD): Spark's hash
  * aggregate gives per-partition partial buffers merged in a tree — the
  * treeAggregate shape, expressed in Catalyst.
  */
final class Bloom(val bits: Array[Long], val numHashes: Int) extends Serializable {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9eecb0b2b6e3bL
    z ^ (z >>> 31)
  }

  private def baseHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bs.length) { h ^= (bs(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def numBits: Long = bits.length.toLong * 64

  def add(s: String): Unit = {
    val h1 = baseHash(s)
    val h2 = mix(h1)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      bits((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(s: String): Boolean = {
    val h1 = baseHash(s)
    val h2 = mix(h1)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((bits((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** in-place bitwise OR merge; filters must share geometry. */
  def mergeInPlace(o: Bloom): Bloom = {
    require(o.bits.length == bits.length && o.numHashes == numHashes,
      "bloom geometry mismatch")
    var i = 0
    while (i < bits.length) { bits(i) |= o.bits(i); i += 1 }
    this
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(numHashes).putInt(bits.length)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

object Bloom {
  def create(expectedItems: Long, fpp: Double = 0.01): Bloom = {
    val n = math.max(expectedItems, 64L)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    new Bloom(new Array[Long](((m + 63) / 64).toInt), k)
  }

  def deserialize(bytes: Array[Byte]): Bloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val len = bb.getInt
    val bits = new Array[Long](len)
    var i = 0
    while (i < len) { bits(i) = bb.getLong; i += 1 }
    new Bloom(bits, k)
  }

  /** Typed Aggregator: partial per-partition build + tree merge in Catalyst. */
  final class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[String, Bloom, Array[Byte]] {
    def zero: Bloom = create(expectedItems, fpp)
    def reduce(b: Bloom, url: String): Bloom = { if (url != null) b.add(url); b }
    def merge(a: Bloom, b: Bloom): Bloom = a.mergeInPlace(b)
    def finish(b: Bloom): Array[Byte] = b.serialize
    def bufferEncoder: Encoder[Bloom] = Encoders.kryo[Bloom]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a bloom over a url column, distributed. */
  def build(spark: SparkSession, urls: DataFrame, urlCol: String,
      expectedItems: Long, fpp: Double = 0.01): Bloom = {
    import spark.implicits._
    val ds = urls.select(col(urlCol)).as[String]
    val agg = new BloomAgg(expectedItems, fpp)
    val bytes = ds.select(agg.toColumn.name("bloom")).head()
    deserialize(bytes)
  }

  /** mightContain as a Column against a broadcast serialized bloom. */
  def mightContainCol(spark: SparkSession, bloom: Bloom, c: Column): Column = {
    val b = spark.sparkContext.broadcast(bloom.serialize)
    val f = udf { (s: String) =>
      if (s == null) false else BloomCache.get(b.value).mightContain(s)
    }
    f(c)
  }
}

/** Per-executor deserialized-bloom cache (avoid re-parsing per row). */
object BloomCache {
  @transient @volatile private var cached: (Array[Byte], Bloom) = null
  def get(bytes: Array[Byte]): Bloom = {
    val c = cached
    if (c != null && (c._1 eq bytes)) c._2
    else {
      val b = Bloom.deserialize(bytes)
      cached = (bytes, b)
      b
    }
  }
}
