package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Sharded distributed URL-seen set (A9 at 10^10-url scale).
  *
  * Round 1 materialized ONE Bloom filter on the driver (`.head()` of the
  * aggregate) — at a 10^10-url frontier a 1%-fpp filter is ~12 GB through
  * driver memory and a single broadcast. This implementation shards by url
  * hash range:
  *
  *   - build: one `groupByKey(shard)` aggregation — per-partition partial
  *     Bloom buffers merged in Catalyst's tree (same typed Aggregator as the
  *     single-shard path), one output row per shard, each shard's bitset
  *     written to its own file by the executor that owns it. The driver
  *     never holds a filter.
  *   - probe: a scalar kernel `url -> shardOf(url) -> registry lookup ->
  *     mightContain`. Executors lazily load only the shard files their rows
  *     touch (per-JVM cache); repartitioning candidates by shard makes each
  *     task touch exactly one shard. No broadcast of the full filter set.
  *   - merge: delta waves OR their shard bitsets into the previous version's
  *     files executor-side (same geometry), then publish a new version dir —
  *     the MOR pattern for filter state.
  *
  * Replaces sentry's in-memory `enqued` map (crawler.go:27-29) as the
  * scalable prefilter; exactness still comes from the anti-join confirm.
  */
object ShardedBloom {

  /** FNV-1a-derived shard of a url — computed identically at build and
    * probe (plain JVM function, usable inside any UDF). */
  def shardOf(s: String, shards: Int): Int = {
    var h = 0xcbf29ce484222325L
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bs.length) { h ^= (bs(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    // avalanche so shard bits are independent of the Bloom's base hash use
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d9eecb0b2b6e3bL
    z = z ^ (z >>> 31)
    java.lang.Math.floorMod(z, shards.toLong).toInt
  }

  def shardCol(c: Column, shards: Int): Column = {
    val f = udf((s: String) => if (s == null) 0 else shardOf(s, shards))
    f(c)
  }

  private def fs(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(new Configuration()), p)
  }

  def shardFile(dir: String, shard: Int): String = s"$dir/shard-$shard.bloom"

  /** Build per-shard Blooms over `urls(urlCol)` and write one file per
    * shard under `dir`, optionally OR-merging the same shard's bits from
    * `prevDir` (must share geometry). Executor-side writes; the driver only
    * triggers the job. */
  def buildToDir(spark: SparkSession, urls: DataFrame, urlCol: String,
      shards: Int, perShardItems: Long, fpp: Double, dir: String,
      prevDir: Option[String] = None): Unit = {
    import spark.implicits._
    val (fsys, base) = fs(dir)
    fsys.mkdirs(base)
    val agg = new ShardBloomAgg(perShardItems, fpp)
    val sharded = urls.select(shardCol(col(urlCol), shards).as("shard"),
        col(urlCol).as("url"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("bloom"))
    sharded.foreachPartition { (it: Iterator[(Int, Array[Byte])]) =>
      it.foreach { case (shard, bytes) =>
        val bloom = Bloom.deserialize(bytes)
        val merged = prevDir.flatMap(p => readShard(p, shard)) match {
          case Some(prev) => prev.mergeInPlace(bloom)
          case None       => bloom
        }
        writeShard(dir, shard, merged)
      }
    }
    // shards with no new urls still need carrying forward from prevDir
    prevDir.foreach { p =>
      val (pfs, pbase) = fs(p)
      val (dfs, _) = fs(dir)
      if (pfs.exists(pbase)) {
        pfs.listStatus(pbase).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith("shard-") && name.endsWith(".bloom") &&
              !dfs.exists(new Path(dir, name)))
            org.apache.hadoop.fs.FileUtil.copy(pfs, st.getPath, dfs,
              new Path(dir, name), false, new Configuration())
        }
      }
    }
  }

  private[crawl] def writeShard(dir: String, shard: Int, bloom: Bloom): Unit = {
    val (fsys, _) = fs(dir)
    val target = new Path(shardFile(dir, shard))
    val tmp = new Path(shardFile(dir, shard) + ".tmp")
    val out = fsys.create(tmp, true)
    try out.write(bloom.serialize) finally out.close()
    if (fsys.exists(target)) fsys.delete(target, false) // idempotent retry
    fsys.rename(tmp, target)
  }

  private[crawl] def readShard(dir: String, shard: Int): Option[Bloom] = {
    val (fsys, _) = fs(dir)
    val p = new Path(shardFile(dir, shard))
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      try {
        val len = fsys.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(buf)
        Some(Bloom.deserialize(buf))
      } finally in.close()
    }
  }

  /** Column probe: true iff the url's shard filter might contain it. A url
    * in a missing shard file was never added → false (no false negatives).
    * Shard files load lazily per executor via ShardRegistry. */
  def mightContainCol(dir: String, shards: Int, c: Column): Column = {
    val f = udf { (url: String) =>
      if (url == null) false
      else ShardRegistry.get(dir, shardOf(url, shards)).mightContain(url)
    }
    f(c)
  }

  /** Typed Aggregator keyed by (shard, url) pairs. */
  final class ShardBloomAgg(expectedItems: Long, fpp: Double)
      extends org.apache.spark.sql.expressions.Aggregator[(Int, String), Bloom, Array[Byte]] {
    def zero: Bloom = Bloom.create(expectedItems, fpp)
    def reduce(b: Bloom, kv: (Int, String)): Bloom = {
      if (kv._2 != null) b.add(kv._2); b
    }
    def merge(a: Bloom, b: Bloom): Bloom = a.mergeInPlace(b)
    def finish(b: Bloom): Array[Byte] = b.serialize
    def bufferEncoder: org.apache.spark.sql.Encoder[Bloom] =
      org.apache.spark.sql.Encoders.kryo[Bloom]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }
}

/** Per-JVM lazy shard-filter cache; missing files resolve to an empty
  * filter. Bounded: old versions evicted once the cache exceeds 256
  * entries (new wave = new version dir = new keys). */
object ShardRegistry {
  private val empty = new Bloom(new Array[Long](1), 1)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Bloom]()
  def get(dir: String, shard: Int): Bloom = {
    val key = ShardedBloom.shardFile(dir, shard)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      if (cache.size() > 256) cache.clear()
      val b = ShardedBloom.readShard(dir, shard).getOrElse(empty)
      cache.put(key, b)
      b
    }
  }
}
