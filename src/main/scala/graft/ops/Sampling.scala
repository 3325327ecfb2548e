package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-mixing operators for corpus curation.
  *
  * Spark's own `DataFrame.sample` draws from a per-partition RNG stream, so
  * its row set depends on the physical partition layout — re-running the
  * same sample at a different parallelism (or after an AQE re-plan, or on
  * resume from checkpoint) selects DIFFERENT rows. A training-data pipeline
  * needs the opposite: the sample must be a pure function of the data so a
  * resumed or re-sharded job reproduces it bit-for-bit. Every operator here
  * therefore keys its decision on a cryptographic hash of the row key —
  * stateless, map-only (no shuffle, no RNG state), identical at any
  * parallelism, and cheap enough to run inline on a 100 TB scan.
  *
  * The hash is sha-256 (not xxhash64) so the DuckDB oracle can recompute
  * the identical decision: both engines emit the same lowercase hex digest,
  * and a fixed-width hex prefix compares lexicographically exactly like the
  * integer it encodes.
  */
object Sampling {

  /** 8-hex-digit threshold encoding `rate` over the 32-bit hash prefix:
    * a row is kept iff its prefix < threshold, so P(keep) = rate exactly
    * (up to 2^-32 quantization). */
  def thresholdHex(rate: Double): String = {
    val r = math.max(0.0, math.min(1.0, rate))
    f"${math.min((r * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  private def prefix(key: Column, salt: String): Column =
    substring(sha2(concat(key.cast("string"), lit(salt)), 256), 1, 8)

  /** Bernoulli(rate) sample keyed on `key`: keep iff
    * sha256(key||salt)[0,8) < rate·2^32. Changing `salt` draws an
    * independent sample; the same (key, salt) always decides the same way
    * (the property that makes train/validation splits stable across reshards
    * and resumes). Map-only — the filter rides the scan. */
  def hashSample(df: DataFrame, key: Column, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(prefix(key, salt) < lit(thresholdHex(rate)))

  /** Deterministic N-way split (train/validation/test): assign each row a
    * split label by which sub-interval of the 32-bit hash prefix it lands
    * in — fractions [f1, f2, ...] cut [0, 2^32) at their running sums, the
    * remainder (1 - Σf) falls to the LAST label. Splits are exactly
    * disjoint and exhaustive BY CONSTRUCTION (one hash, adjacent
    * intervals — two independent hashSample calls can never guarantee
    * that), a pure function of (key, salt) — stable across reshards,
    * resumes, and engines — and monotone: growing a fraction only moves
    * rows in from its right neighbor. Map-only, label is one codegen'd
    * string-range compare. `labels.size == fractions.size + 1`. */
  def splitByHash(df: DataFrame, key: Column, fractions: Seq[Double],
      labels: Seq[String], salt: String = ""): DataFrame = {
    require(labels.size == fractions.size + 1,
      s"need ${fractions.size + 1} labels for ${fractions.size} cuts")
    require(fractions.forall(_ >= 0) && fractions.sum <= 1.0 + 1e-9,
      s"fractions must be >= 0 and sum <= 1: $fractions")
    // a cut at a running sum >= 1.0 must swallow EVERY prefix, including
    // "ffffffff" (thresholdHex clamps to 2^32-1, which would leak that one
    // prefix into the remainder label): "g" > any hex digit, so the
    // comparison is unconditionally true and the remainder is exactly
    // empty. The epsilon mirrors the sum <= 1.0 + 1e-9 require above:
    // float addition can leave a nominally-full running sum just below 1.0
    // (0.3+0.3+0.4 == 0.9999999999999999), and without it that final cut
    // would stay at "ffffffff" and leak the single "ffffffff" prefix into
    // the remainder label the caller expects to be empty
    // the epsilon clamp applies ONLY to the LAST cut (the one the require
    // above allows to be nominally full): applied to every cut it also
    // fired on an intermediate sum within 1e-9 of 1.0 — e.g. fractions
    // [1.0 - 5e-10, 5e-10] mapped the penultimate cut to "g" and silently
    // absorbed the caller's non-empty final stratum into the previous
    // label (round-5 ADVICE finding)
    val sums = fractions.scanLeft(0.0)(_ + _).tail
    val cuts = sums.zipWithIndex.map { case (s, i) =>
      if (i == sums.size - 1 && s >= 1.0 - 1e-9) "g" else thresholdHex(s)
    }
    val p = prefix(key, salt)
    val label = cuts.zip(labels).foldRight(lit(labels.last): Column) {
      case ((cut, lab), rest) => when(p < lit(cut), lit(lab)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Deterministic fraction-per-group sampling (data mixing): `weights` is
    * a small (group, rate) table — broadcast — and each row keeps iff its
    * hash prefix clears its own group's threshold. The corpus side never
    * shuffles: one broadcast hash join + a codegen'd string compare, which
    * is what lets a 100 TB corpus be re-weighted in a single map pass.
    * Rows whose group has no weight row are dropped (rate 0). */
  def weightedSample(df: DataFrame, groupCol: Column, weights: DataFrame,
      key: Column, salt: String = ""): DataFrame = {
    // clamp to [0, 2^32-1] exactly like thresholdHex: without the lower
    // bound a negative rate would reach format_string as a negative long,
    // print as 16 chars of two's complement ("ffffffff…"), and every 8-hex
    // prefix would compare BELOW it — keeping the whole group instead of
    // dropping it
    val w = weights.select(col("group").as("_mix_group"),
      format_string("%08x",
        greatest(least(floor(col("rate") * 4294967296.0), lit(4294967295.0)),
          lit(0.0)).cast("long"))
        .as("_mix_threshold"))
    df.withColumn("_mix_group", groupCol)
      .join(broadcast(w), Seq("_mix_group"))
      .filter(prefix(key, salt) < col("_mix_threshold"))
      .drop("_mix_group", "_mix_threshold")
  }

  /** Per-source epoch mixing: sources a pipeline wants over-represented
    * repeat an integer number of epochs (the "Wikipedia ×3" pattern).
    * `epochs` is a small (group, epochs:int) table — broadcast — and each
    * row explodes into (row, epoch=1..k). sequence+explode is codegen'd;
    * output size is Σ epochs·|group|, declared by the weights table, and
    * the explode is embarrassingly parallel (no shuffle). Unweighted
    * groups default to one epoch; epochs <= 0 DROPS the group (the natural
    * exclude spelling, matching weightedSample's rate-0) — guarded
    * explicitly because Spark's sequence(1, 0) counts DOWN ([1, 0]) and
    * would otherwise duplicate the rows it was meant to drop. */
  def epochMix(df: DataFrame, groupCol: Column, epochs: DataFrame): DataFrame = {
    val e = epochs.select(col("group").as("_mix_group"),
      col("epochs").cast("int").as("_mix_epochs"))
    val k = coalesce(col("_mix_epochs"), lit(1))
    df.withColumn("_mix_group", groupCol)
      .join(broadcast(e), Seq("_mix_group"), "left")
      .withColumn("epoch",
        explode(when(k >= 1, sequence(lit(1), k))
          .otherwise(array().cast("array<int>"))))
      .drop("_mix_group", "_mix_epochs")
  }

  /** Deterministic output-shard assignment — the LAST operator of a
    * training-data pipeline: the corpus writes as n shards whose membership
    * is a pure function of the key, so a re-run (or a resumed job, or a
    * different cluster size) produces byte-identical shard files. shard =
    * (first two hex digits of sha256(key||salt) as an int in [0,256)) mod n
    * — uniform for n ≤ 256, recomputable in any engine with a sha256 and
    * string ops. Map-only; the downstream `repartition(col("shard"))` (or
    * partitionBy on write) is the single intentional exchange.
    *
    * n ≤ 256 reads two hex digits (8 hash bits — exactly uniform when n
    * divides 256; this recipe is oracle-pinned, never change it); larger n
    * reads four digits (16 bits, near-uniform mod bias ≤ n/65536), which
    * is the path a 100 TB corpus uses — thousands of shards so each packs/
    * writes in one task. */
  def assignShards(df: DataFrame, key: Column, n: Int,
      salt: String = ""): DataFrame = {
    require(n > 0 && n <= 65536, s"n must be in [1,65536], got $n")
    val h = sha2(concat(key.cast("string"), lit(salt)), 256)
    val digits = if (n <= 256) 2 else 4
    val v = conv(substring(h, 1, digits), 16, 10).cast("int")
    df.withColumn("shard", pmod(v, lit(n)))
  }

  /** Sequence packing — the concat-and-chunk step that turns a document
    * corpus into fixed-token-budget training sequences: documents are
    * (conceptually) concatenated in a deterministic pseudo-random order and
    * the stream is cut every `budget` tokens. Each document is mapped to
    * the sequence it STARTS in and its token offset there; a document
    * longer than the remaining room simply spans into the next sequence(s)
    * (the standard packing-with-crossdoc-boundaries used when attention
    * masks separate documents).
    *
    * Scale shape: packing is inherently sequential — a document's offset
    * depends on every document before it — so the corpus is first split
    * into `nShards` independent pack units by key hash (map-only, the
    * [[assignShards]] rule), and the sequential scan runs per shard: ONE
    * shuffle on shard, then a per-shard sort + running sum window. Shard
    * count is the parallelism knob — size it so corpus/nShards rows sort
    * in one task (at 100 TB that means thousands of shards, each becoming
    * one output file, which is how packing jobs shard in practice).
    * Determinism: order inside a shard is (hash-prefix, key) — a pure
    * function of the data, so re-runs, resumes, and different cluster
    * sizes pack identically (Spark's own ordering-free cumsum could not
    * be oracle-checked).
    *
    * Output: every input column plus (shard, seq_id, seq_offset) —
    * seq_id = floor(prev_tokens / budget) counted per shard,
    * seq_offset = prev_tokens % budget. All integer arithmetic. */
  def packSequences(df: DataFrame, key: Column, tokensCol: Column,
      budget: Long, nShards: Int, salt: String = ""): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val sharded = assignShards(df, key, nShards, salt)
      .withColumn("_p_hash", prefix(key, salt))
      .withColumn("_p_tok", tokensCol.cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_p_hash"), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("_p_prev", coalesce(sum(col("_p_tok")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"_p_prev div ${budget}L")) // integer div, never float
      .withColumn("seq_offset", col("_p_prev") % budget)
      .drop("_p_hash", "_p_tok", "_p_prev")
  }

  /** Deterministic global row enumeration: contiguous ids 0..n-1 over the
    * whole corpus in a canonical order (hash of the key, then the key) —
    * the stable document-id assignment a training pipeline needs, without
    * ever sorting the corpus in one partition.
    *
    * The naive spelling — `row_number() OVER (ORDER BY ...)` with no
    * partition — funnels 100 TB through a single task. The scalable shape
    * exploits that the sort key IS a hash: its first byte range-partitions
    * the order into 256 hash-uniform buckets, so global position = (sum of
    * whole buckets before mine) + (rank within my bucket). One groupBy for
    * the 256 bucket counts, a 256-row cumsum (the only single-partition
    * step — over BUCKETS, not rows), a broadcast join of the offsets, and
    * a per-bucket window. No driver collect; skew-immune by hash
    * uniformity. Identical ids at any parallelism, on resume, and across
    * engines (the oracle is one plain row_number). */
  def globalRowNumbers(df: DataFrame, key: Column, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .withColumn("_g_hash", prefix(key, salt))
      .withColumn("_g_bucket", conv(substring(col("_g_hash"), 1, 2), 16, 10).cast("int"))
    val counts = hashed.groupBy("_g_bucket").agg(count(lit(1)).as("_g_n"))
    val offsets = counts
      .withColumn("_g_offset", coalesce(
        sum("_g_n").over(Window.orderBy("_g_bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_g_bucket", "_g_offset")
    hashed.join(broadcast(offsets), Seq("_g_bucket"))
      .withColumn("global_id", col("_g_offset") +
        row_number().over(Window.partitionBy("_g_bucket")
          .orderBy(col("_g_hash"), key)).cast("long") - 1)
      .drop("_g_hash", "_g_bucket", "_g_offset")
  }

  /** Per-group quota (stratified cap): keep at most `k` rows per group,
    * chosen by hash order (deterministic, unbiased by ingest order) with
    * the key as tiebreak. The rank filter is a constant bound, so Spark 4's
    * WindowGroupLimit keeps each group's top-k BELOW the exchange — a
    * mega-group (one domain with 10^9 docs) contributes k rows per input
    * partition to the shuffle, never its whole population. This is the
    * skew-immune way to cap dominant domains in a crawl corpus. */
  def groupQuota(df: DataFrame, groupCol: Column, key: Column, k: Int,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .withColumn("_q_hash", prefix(key, salt))
      .withColumn("_q_rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("_q_hash"), key)))
    ranked.filter(col("_q_rn") <= k).drop("_q_hash", "_q_rn")
  }
}
