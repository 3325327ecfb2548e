package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins whose key distribution is pathological —
  * the mega-host problem: one host (key) holds 10^8 of the 10^9 rows, so a
  * plain hash join sends them all to one reducer and the stage runs at the
  * speed of that one task. AQE's runtime skew-join split handles MOST of
  * this automatically (and the crawl scheduler relies on it for the enqueue
  * anti-joins); this operator is the deterministic, plan-time version for
  * when the skew is KNOWN up front and the job wants stable task shapes —
  * e.g. a links ⋈ urls join where the crawler already knows its top hosts.
  *
  * Salting: the big side gets a salt in [0, salts) derived from the WHOLE
  * row hash (never the key — rows sharing the key must scatter), the small
  * side replicates each row `salts` times (sequence+explode, codegen'd),
  * and the join keys on (key, salt) — each former mega-partition becomes
  * `salts` even slices. The result set is EXACTLY the plain join's: salting
  * only re-partitions work. Cost: the small side's shuffle volume ×salts —
  * which is why the small side must be the dimension table, and why
  * `salts` should be ~the skew factor, not a big constant.
  */
object Skew {

  /** Inner equi-join with a salted exchange. Output columns: every `big`
    * column, then every non-key `small` column (names must not collide,
    * as with a plain `join(..., Seq(key))`).
    *
    * The salt hashes only the big side's HASHABLE columns — Spark's
    * hash/xxhash64 reject MapType anywhere in the type (urls rows carry
    * `meta: Map[String,String]`, so hashing the whole row struct threw at
    * analysis time). Fully-duplicate rows still share a salt (inherent to
    * deterministic row hashing — determinism is what keeps retries safe);
    * rows-distinct-only-by-a-map-column degrade the same way. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = big.schema.fields.filter(f => hashable(f.dataType))
      .map(f => col(f.name))
    require(saltCols.nonEmpty,
      "saltedJoin: big side has no hashable (non-map) column to derive a salt from")
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(saltCols: _*)), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "_salt")).drop("_salt")
  }
}
