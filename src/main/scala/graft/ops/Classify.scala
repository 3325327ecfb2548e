package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear text-classifier INFERENCE — the fastText-style quality/domain
  * classifier pass every published web-corpus pipeline runs after the
  * heuristic gates (CCNet's fastText language filter, the FineWeb-Edu and
  * DCLM quality classifiers): score = bias + mean over tokens of per-term
  * weights, keep documents whose score clears a threshold. TRAINING happens
  * offline (needs labels + an optimizer); the corpus-scale cost is this
  * inference pass, so that is the operator.
  *
  * Everything is exact INTEGER arithmetic in micro-units — the margin is
  *   margin_micro(d) = Σ_{t ∈ tokens(d)} w_micro(t)
  * and the keep decision compares mean margin to the threshold by
  * cross-multiplication (margin_micro ≥ thr_micro · n_tokens), so results
  * hash-compare bit-exactly across engines and parallelism levels (a float
  * dot product + sigmoid would differ in the last ulp by summation order;
  * the sigmoid is monotone, so thresholding the mean margin is the same
  * decision).
  *
  * Scale shape (100 TB corpus, 10^6-term dictionary): token counts are one
  * narrow (doc, term) groupBy with map-side combine; the dictionary join is
  * sort-merge by default (a web-scale term dictionary can exceed broadcast);
  * with `buckets > 0` terms hash-fold into a fixed feature space (the
  * fastText hashing trick — collisions SUM their weights, matching training
  * done in the same space) and the folded LUT broadcasts, so the corpus
  * never shuffles for the dictionary. Per-doc combine is narrow
  * (doc_id, long) rows either way.
  */
object Classify {

  private def toksCol(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => length(t) > 0)

  /** Score `docs` against a linear model.
    *
    * @param weights   (term: string, w_micro: long) — per-term weight in
    *                  micro-units (1e-6), as trained offline
    * @param thrMicro  keep iff margin_micro ≥ thrMicro · n_tokens (mean
    *                  margin ≥ thrMicro/1e6); empty docs never keep
    * @param buckets   0 = exact terms (sort-merge dictionary join);
    *                  >0 = hash terms into `buckets` features, fold
    *                  colliding weights by sum, broadcast the LUT (map-only
    *                  corpus pass)
    * @return one row per input doc: (idCol, margin_micro, n_tokens, keep)
    */
  def linearScores(docs: DataFrame, weights: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      thrMicro: Long = 0L, buckets: Int = 0): DataFrame = {
    val featOf: Column => Column =
      if (buckets > 0) t => pmod(xxhash64(t), lit(buckets.toLong))
      else t => t
    val lut = weights
      .select(featOf(lower(trim(col("term")))).as("f"),
        col("w_micro").cast("long").as("w"))
      .groupBy("f").agg(sum("w").as("w")) // hash collisions fold by sum
    val toks = docs.select(col(idCol), explode(toksCol(col(textCol))).as("tok"))
      .select(col(idCol), featOf(col("tok")).as("f"))
    val tf = toks.groupBy(idCol, "f").agg(count(lit(1)).as("tf"))
    val hits =
      (if (buckets > 0) tf.join(broadcast(lut), Seq("f"))
       else tf.join(lut, Seq("f")))
        .groupBy(idCol).agg(sum(col("tf") * col("w")).as("margin_micro"))
    // sum the already-built tf frame instead of re-aggregating toks: toks
    // is un-cached, so a second groupBy over it would re-run the corpus
    // split+explode and pay a second corpus-sized shuffle for the same
    // number (featOf maps every token, so sum(tf) == count(toks))
    val counts = tf.groupBy(idCol).agg(sum("tf").as("n_tokens"))
    docs.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("margin_micro"), lit(0L)).as("margin_micro"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("keep",
        col("n_tokens") > 0 &&
          col("margin_micro") >= lit(thrMicro) * col("n_tokens"))
  }
}
