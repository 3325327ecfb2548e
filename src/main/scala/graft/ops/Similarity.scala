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

  /** Deterministic hyperplane signature: bit i = sign(dot(v, r_i)) with
    * GAUSSIAN normals r_i derived from splitmix64(seed, ...) via Box-Muller
    * (classic sign-random-projection LSH). Gaussian — not Rademacher ±1 —
    * matters: ±1 normals restricted to a low-dimensional subspace of the
    * data collapse to a handful of boundary directions (in a 2-effective-dim
    * embedding they give exactly two boundary lines, so pairs straddling one
    * of them are split by ~half of ALL planes in every band — measured as a
    * deterministic recall hole in round 2). Gaussian normals are rotation-
    * invariant, so P(plane splits pair) = theta/pi holds in any subspace.
    * One compact kernel over the array (a dim x planes expression tree made
    * planning and codegen the bottleneck — measured 7x slower). */
  def hyperplaneSig(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    @inline def mix(i: Long): Long = {
      var z = seed + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d9eecb0b2b6e3bL
      z ^ (z >>> 31)
    }
    @inline def unit(z: Long): Double = // (0,1]
      ((z >>> 11) + 1).toDouble / (1L << 53).toDouble
    val normals: Array[Array[Float]] = Array.tabulate(planes, dim) { (i, j) =>
      val k = i.toLong * dim + j
      val u1 = unit(mix(2 * k))
      val u2 = unit(mix(2 * k + 1))
      (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
    }
    val f = udf { (vec: Array[Float]) =>
      var sig = 0L
      var i = 0
      while (i < planes) {
        var dot = 0.0
        val row = normals(i)
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

  /** The banded hyperplane signature explode shared by ANN and the
    * embedding near-dup pipeline: `bands` independent AND-bands of
    * `rowsPerBand` hyperplanes each, OR-amplified by the bucket join. */
  private[ops] def bandedSig(v: Column, dim: Int, rowsPerBand: Int,
      bands: Int, seed: Long): Column =
    explode(array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        hyperplaneSig(v, dim, rowsPerBand, seed + 0x51ed2701L * b)
          .as("bucket"))): _*))

  /** Banded-LSH ANN top-k.
    *
    * Round 2 used single-table multi-probe (probe all buckets within
    * `maxFlips` Hamming distance): at planes=10/maxFlips=3 each query
    * touched 176/1024 buckets ≈ 17% of the corpus, and candidate rows
    * dragged both float arrays through the dedup exchange. This is the
    * banded OR-construction instead (the embeddingDupPairs layout):
    * P(candidate) = 1-(1-p^r)^b with p = 1-theta/pi — at r=4, b=24 a
    * cosine-0.95 neighbor is missed with probability ~2e-12, while an
    * orthogonal vector (p=0.5) collides in any band with chance
    * 1-(1-1/16)^24 ≈ 0.79 per band set but each band bucket holds only
    * ~1/2^r of the corpus — expected probed fraction ~b/2^r ≈ bucket-
    * population-bound, not enumeration-bound.
    *
    * Scale shape: the corpus is signed ONCE into narrow (vec_id, band,
    * bucket) rows; the tiny query side broadcasts; candidate generation and
    * dedup shuffle only (query_id, vec_id) id pairs — the vectors rejoin BY
    * ID for the exact cosine re-rank (verifyJaccard layout), so no array
    * column ever crosses the candidate exchange.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
      rowsPerBand: Int = 4, bands: Int = 24, seed: Long = 7L): DataFrame = {
    val embB = emb.select(col("vec_id"),
        bandedSig(col("embedding"), dim, rowsPerBand, bands, seed).as("bc"))
      .select(col("vec_id"), col("bc.band").as("band"), col("bc.bucket").as("bucket"))
    val qB = queries.select(col("query_id"),
        bandedSig(col("query_vec"), dim, rowsPerBand, bands, seed).as("bc"))
      .select(col("query_id"), col("bc.band").as("band"), col("bc.bucket").as("bucket"))
    val candIds = embB.join(broadcast(qB), Seq("band", "bucket"))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candIds
      .join(broadcast(queries), Seq("query_id"))
      .join(emb, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineCol(col("query_vec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  /** IVF-flat ANN top-k — the coarse-quantizer index layout that carries
    * billion-vector corpora (the standard alternative to LSH bucketing):
    * train `nlist` centroids, assign every vector to its nearest cell, and
    * answer a query by exact-scoring only the `nprobe` cells whose
    * centroids are closest to it.
    *
    * Scale shape:
    *   - training: deterministic hash-sampled seeds + `lloydIters` Lloyd
    *     rounds, each ONE map-only pass (per-cell vector sums via map-side
    *     combine; no shuffle wider than nlist×dim). Centroids live
    *     driver-side and broadcast with the assignment kernel — at
    *     nlist=65536, dim=768 that is ~200 MB, broadcast-sized.
    *   - assignment: one-pass argmax kernel per row (map-only, same
    *     UDF-kernel rationale as hyperplaneSig — an nlist-way join would
    *     shuffle N×nlist rows); the index is narrow (cell, vec_id).
    *   - search: queries broadcast with their nprobe cell lists; candidate
    *     rows are id-only; vectors rejoin BY ID for the exact re-rank, so
    *     no array crosses the candidate exchange. Expected probed fraction
    *     ≈ nprobe/nlist of the corpus.
    * Determinism: seeds are hash-ranked vec_ids (exact at any
    * parallelism), and all ties break on the lower cell id / vec_id. One
    * caveat is inherent to distributed k-means: the Lloyd update sums
    * floats in shuffle order, so centroids can differ in trailing ulps
    * between plans, and a vector sitting EXACTLY on a cell boundary may
    * flip cells (changing a query's candidate set by that vector). The
    * final scores are exact re-ranks either way; corpora whose cluster
    * margins exceed float noise (any real embedding corpus, and the ann3
    * oracle fixture) return identical top-k at any parallelism. */
  private[ops] def unitize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Nearest-centroid assignment as `struct(cell int, ccos double)` — the
    * best cell and the COSINE against its (unit) centroid. One UDF serves
    * both the IVF index build (cell) and SemDeDup's keep rule (ccos). The
    * argmax is computed on raw dots (norm-invariant — the same cell wins),
    * but the reported score divides by |vec| so cross-vector comparisons
    * (SemDeDup keeps the LOWEST-centroid-cosine member) are angular, not
    * magnitude-biased, on non-unit embeddings. */
  private[ops] def assignUdf(cents: Array[Array[Double]]) =
    udf { (vec: Array[Float]) =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var norm2 = 0.0
      var k = 0
      while (k < vec.length) { norm2 += vec(k).toDouble * vec(k); k += 1 }
      var c = 0
      while (c < cents.length) {
        val row = cents(c)
        var dot = 0.0; var j = 0
        val n = math.min(row.length, vec.length)
        while (j < n) { dot += row(j) * vec(j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      (best, if (norm2 == 0.0) 0.0 else bestDot / math.sqrt(norm2))
    }

  /** Deterministic cosine k-means over `(vec_id, embedding)`: seeds are the
    * nlist hash-smallest vectors (a fixed pseudo-random sample, stable
    * across runs and parallelism); each Lloyd round is one map-only pass
    * (sum + count per cell, empty cells keep their previous centroid);
    * compare by dot against UNIT centroids, update to the renormalized mean
    * direction. Returns unit centroids. Float-sum shuffle-order caveat: see
    * [[ivfTopK]]. */
  private[ops] def trainCentroids(emb: DataFrame, dim: Int, nlist: Int,
      lloydIters: Int): Array[Array[Double]] =
    // seed TakeOrdered + per-round nlist-row Lloyd collects: narrow rows,
    // data-sized reduce layout for the eager training jobs
    AdaptiveShuffle.narrowRows(emb.sparkSession) {
    var centroids: Array[Array[Double]] = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(lit("ivf-seed"), col("vec_id")), col("vec_id"))
      .limit(nlist).collect()
      .map(r => unitize(r.getSeq[Float](1).toArray.map(_.toDouble)))
    for (_ <- 0 until lloydIters) {
      val cents = centroids
      val sums = emb
        .select(assignUdf(cents)(col("embedding")).getField("_1").as("cell"),
          col("embedding"))
        .groupBy("cell")
        .agg(array((0 until dim).map(j =>
          sum(element_at(col("embedding"), j + 1)).as(s"s$j")): _*).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val cell = r.getInt(0)
        val s = r.getSeq[Double](1).toArray
        next(cell) = unitize(s)
      }
      centroids = next
    }
    centroids
  }

  /** Per-query top-nprobe probe cells by centroid dot (queries are tiny;
    * the centroid table rides the closure). Shared by IVF-flat and IVFPQ. */
  private[ops] def probeCellsUdf(centroids: Array[Array[Double]], nprobe: Int) =
    udf { (vec: Array[Float]) =>
      centroids.zipWithIndex.map { case (row, c) =>
        var dot = 0.0; var j = 0
        val n = math.min(row.length, vec.length)
        while (j < n) { dot += row(j) * vec(j); j += 1 }
        (dot, c)
      }.sortBy { case (d, c) => (-d, c) }.take(nprobe).map(_._2)
    }

  /** Exact cosine re-rank of an id-only candidate frame (query_id, vec_id):
    * queries broadcast, vectors rejoin BY ID, top-k per query. The shared
    * tail of every ANN variant — no array column ever crosses a candidate
    * exchange because only ids arrive here. */
  private[ops] def exactRerank(candIds: DataFrame, queries: DataFrame,
      emb: DataFrame, k: Int): DataFrame = {
    val scored = candIds
      .join(broadcast(queries), Seq("query_id"))
      .join(emb, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineCol(col("query_vec"), col("embedding")).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  def ivfTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nlist: Int = 8, nprobe: Int = 3, lloydIters: Int = 4): DataFrame = {
    val centroids = trainCentroids(emb, dim, nlist, lloydIters)

    val indexed = emb.select(col("vec_id"),
      assignUdf(centroids)(col("embedding")).getField("_1").as("cell"))

    val qCells = queries.select(col("query_id"),
      explode(probeCellsUdf(centroids, nprobe)(col("query_vec"))).as("cell"))

    // each vector lives in exactly one cell and a query's probe cells are
    // distinct, so candidates need no dedup
    val candIds = indexed.join(broadcast(qCells), Seq("cell"))
      .select(col("query_id"), col("vec_id"))
    exactRerank(candIds, queries, emb, k)
  }

  /** Product-quantization ANN top-k (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the memory-compression
    * layout for billion-vector corpora: each unit vector is encoded as `m`
    * sub-codes (one byte each at ksub≤256), so the scan table is m bytes
    * per vector (32x smaller than float32 at dim=64, m=8) and fits where
    * the raw vectors cannot.
    *
    * Scale shape:
    *   - TRAIN: codebooks are learned on a deterministic hash-sample
    *     bounded by `trainSample` — the faiss practice (PQ training never
    *     scans the corpus). Pure driver-side Lloyd on the sample, so the
    *     codebooks are bit-deterministic at ANY parallelism (no
    *     shuffle-order float sums — stronger determinism than distributed
    *     k-means).
    *   - ENCODE: one map-only pass; the index is narrow (vec_id, m codes).
    *   - SEARCH (ADC): per query, an m×ksub lookup table of partial dots;
    *     scanning scores a vector with m table lookups — map-only over the
    *     codes table with the LUTs broadcast. Approximate top-`rerank`
    *     survive a constant-bound rank window (WindowGroupLimit prunes
    *     below the exchange), then vectors rejoin BY ID for the exact
    *     cosine re-rank. No raw vector ever crosses the candidate shuffle.
    *   - PQ-flat scans all N codes per query — GATE-SCALE ONLY; the
    *     billion-scale deployment shape is [[ivfpqTopK]], which composes
    *     this exact codec and scan layout under the IVF coarse quantizer
    *     so only nprobe cells' codes are scanned (ann5-gated).
    * Correctness: the exact re-rank makes emitted scores exact; `rerank`
    * bounds recall (ann4's gate asserts equality with brute force). */
  /** PQ codebooks: deterministic bounded training sample (hash-ranked
    * ids — the faiss practice; PQ training never scans the corpus) +
    * per-subspace L2 Lloyd, all driver-side and bit-exact at any
    * parallelism. Shared by PQ-flat and IVFPQ. */
  private[ops] def trainPqCodebooks(emb: DataFrame, dim: Int, m: Int,
      ksub: Int, lloydIters: Int, trainSample: Int): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    val sample: Array[Array[Double]] = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(lit("pq-train"), col("vec_id")), col("vec_id"))
      .limit(trainSample).collect()
      .map(r => unitize(r.getSeq[Float](1).toArray.map(_.toDouble)))
    Array.tabulate(m) { s =>
      val subs = sample.map(_.slice(s * dsub, (s + 1) * dsub))
      var cents = subs.take(math.min(ksub, subs.length)).map(_.clone())
      for (_ <- 0 until lloydIters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val counts = new Array[Long](cents.length)
        subs.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d2 = 0.0; var j = 0
            while (j < dsub) { val t = x(j) - cents(c)(j); d2 += t * t; j += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          var j = 0
          while (j < dsub) { sums(best)(j) += x(j); j += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  /** Map-only PQ encode: nearest sub-centroid per subspace. */
  private[ops] def pqEncodeUdf(codebooks: Array[Array[Array[Double]]],
      m: Int, dsub: Int) = udf { (vec: Array[Float]) =>
    val v = unitize(vec.map(_.toDouble))
    Array.tabulate(m) { s =>
      val cents = codebooks(s)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d2 = 0.0; var j = 0
        while (j < dsub) {
          val t = v(s * dsub + j) - cents(c)(j); d2 += t * t; j += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      best
    }
  }

  /** Per-query ADC lookup tables of sub-centroid partial dots (queries are
    * tiny; the LUT map rides the closure) + the m-lookup scoring UDF. */
  private[ops] def pqAdcUdf(queries: DataFrame,
      codebooks: Array[Array[Array[Double]]], m: Int, dsub: Int) = {
    val qRows = queries.select(col("query_id"), col("query_vec")).collect()
    val luts: Map[Long, Array[Array[Double]]] = qRows.map { r =>
      val qv = unitize(r.getSeq[Float](1).toArray.map(_.toDouble))
      val lut = Array.tabulate(m) { s =>
        codebooks(s).map { cent =>
          var dot = 0.0; var j = 0
          while (j < dsub) { dot += qv(s * dsub + j) * cent(j); j += 1 }
          dot
        }
      }
      r.getLong(0) -> lut
    }.toMap
    udf { (qid: Long, cs: Seq[Int]) =>
      val lut = luts(qid)
      var s = 0; var acc = 0.0
      while (s < m) { acc += lut(s)(cs(s)); s += 1 }
      acc
    }
  }

  def pqTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
      m: Int = 4, ksub: Int = 16, lloydIters: Int = 8,
      trainSample: Int = 4096, rerank: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val codebooks = trainPqCodebooks(emb, dim, m, ksub, lloydIters, trainSample)
    val codes = emb.select(col("vec_id"),
      pqEncodeUdf(codebooks, m, dsub)(col("embedding")).as("codes"))

    // ADC: approximate score = sum over subspaces of lut(s)(code_s);
    // top-`rerank` per query via a constant-bound rank window; exact
    // re-rank joins vectors by id only for survivors. NOTE: this FLAT scan
    // visits all N codes per query — gate-scale only; the billion-vector
    // deployment shape is [[ivfpqTopK]], which scans nprobe cells' codes.
    val adcUdf = pqAdcUdf(queries, codebooks, m, dsub)
    val qIds = queries.select(col("query_id"))
    val approx = codes.crossJoin(broadcast(qIds))
      .select(col("query_id"), col("vec_id"),
        adcUdf(col("query_id"), col("codes")).as("adc"))
    val wa = Window.partitionBy("query_id").orderBy(desc("adc"), asc("vec_id"))
    val cand = approx.withColumn("arn", row_number().over(wa))
      .filter(col("arn") <= rerank).select("query_id", "vec_id")
    exactRerank(cand, queries, emb, k)
  }

  /** IVFPQ ANN top-k — the PQ codec composed UNDER the IVF coarse
    * quantizer (Jégou et al. 2011 §V, the billion-vector layout faiss
    * ships as `IVFx,PQy`): the index holds (cell, vec_id, codes) — one
    * coarse cell id and m sub-codes per vector — and a query ADC-scans
    * ONLY the `nprobe` cells nearest its vector, so the scan cost is
    * ~nprobe/nlist of the corpus (spec-asserted by row count) instead of
    * pqTopK's all-N flat scan.
    *
    * Scale shape: both trainers are bounded (IVF seeds hash-ranked,
    * Lloyd map-only; PQ trains driver-side on a hash-sample); the index
    * build is ONE map pass emitting narrow rows (two ints + m bytes of
    * codes); search broadcasts the per-query probe-cell list, scores
    * candidates with m LUT lookups, keeps top-`rerank` through a
    * constant-bound rank window (WindowGroupLimit prunes below the
    * exchange), and re-ranks exactly BY ID — no raw vector crosses any
    * candidate exchange. Cell-boundary float caveat as [[ivfTopK]]; the
    * exact re-rank makes emitted scores exact and `rerank` bounds recall
    * (ann5's gate asserts equality with brute force). */
  def ivfpqTopK(emb: DataFrame, queries: DataFrame, dim: Int, k: Int,
      nlist: Int = 8, nprobe: Int = 3, lloydIters: Int = 4,
      m: Int = 4, ksub: Int = 16, pqIters: Int = 8,
      trainSample: Int = 4096, rerank: Int = 64): DataFrame = {
    val cand = ivfpqAdcScan(emb, queries, dim, nlist, nprobe, lloydIters,
      m, ksub, pqIters, trainSample)
    val wa = Window.partitionBy("query_id").orderBy(desc("adc"), asc("vec_id"))
    val pool = cand.withColumn("arn", row_number().over(wa))
      .filter(col("arn") <= rerank).select("query_id", "vec_id")
    exactRerank(pool, queries, emb, k)
  }

  /** The IVFPQ ADC candidate frame (query_id, vec_id, adc) BEFORE the
    * rerank cut — exactly the rows the ADC stage scans. `private[graft]`
    * so the gate spec can row-count it: |scan| ≈ nprobe/nlist · N · Q. */
  private[graft] def ivfpqAdcScan(emb: DataFrame, queries: DataFrame,
      dim: Int, nlist: Int, nprobe: Int, lloydIters: Int,
      m: Int, ksub: Int, pqIters: Int, trainSample: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val centroids = trainCentroids(emb, dim, nlist, lloydIters)
    val codebooks = trainPqCodebooks(emb, dim, m, ksub, pqIters, trainSample)
    // ONE map pass builds the whole index row: coarse cell + PQ codes
    val indexed = emb.select(col("vec_id"),
      assignUdf(centroids)(col("embedding")).getField("_1").as("cell"),
      pqEncodeUdf(codebooks, m, dsub)(col("embedding")).as("codes"))
    val qCells = queries.select(col("query_id"),
      explode(probeCellsUdf(centroids, nprobe)(col("query_vec"))).as("cell"))
    val adcUdf = pqAdcUdf(queries, codebooks, m, dsub)
    // a vector lives in exactly one cell and probe cells are distinct →
    // no candidate dedup; only probed cells' code rows are ever scored
    indexed.join(broadcast(qCells), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        adcUdf(col("query_id"), col("codes")).as("adc"))
  }
}
