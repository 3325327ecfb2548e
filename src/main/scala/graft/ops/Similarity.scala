package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * The dot products are pure built-in higher-order functions
  * (zip_with/aggregate — codegen'd, no UDF). Brute-force top-k is the
  * correctness baseline; the scale path is hyperplane-LSH bucketing: probe
  * only same-bucket candidates (multi-probe by flipping bits would extend
  * recall), so cost is bucket-size-bound instead of table-size-bound.
  */
object Similarity {

  /** codegen-friendly dot product of two array<float> columns. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Deterministic hyperplane signature: bit i = sign(dot(v, r_i)) where
    * r_i components come from splitmix64(seed, i*dim+j) mapped to ±1.
    * One compact kernel over the array (a dim×planes expression tree made
    * planning and codegen the bottleneck — measured 7x slower). */
  def hyperplaneSig(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val signs: Array[Array[Float]] = Array.tabulate(planes, dim) { (i, j) =>
      var z = seed + (i.toLong * dim + j) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d9eecb0b2b6e3bL
      z = z ^ (z >>> 31)
      if (z >= 0) 1.0f else -1.0f
    }
    val f = udf { (vec: Array[Float]) =>
      var sig = 0L
      var i = 0
      while (i < planes) {
        var dot = 0.0
        val row = signs(i)
        var j = 0
        val n = math.min(dim, vec.length)
        while (j < n) { dot += vec(j) * row(j); j += 1 }
        if (dot >= 0) sig |= (1L << i)
        i += 1
      }
      sig
    }
    f(v)
  }

  /** Brute-force cosine top-k per query: cross join (queries broadcast) +
    * per-query window top-k (TakeOrderedAndProject shape). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = emb.alias("e").join(broadcast(queries.alias("q")))
      .select(col("q.query_id"), col("e.vec_id"),
        cosineCol(col("q.query_vec"), col("e.embedding")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's bucket. */
  def lshTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
      planes: Int = 10, seed: Long = 7L): DataFrame = {
    val embB = emb.withColumn("bucket",
      hyperplaneSig(col("embedding"), dim, planes, seed))
    val qB = queries.withColumn("bucket",
      hyperplaneSig(col("query_vec"), dim, planes, seed))
    val scored = embB.alias("e").join(broadcast(qB.alias("q")), Seq("bucket"))
      .select(col("q.query_id"), col("e.vec_id"),
        cosineCol(col("q.query_vec"), col("e.embedding")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }
}
