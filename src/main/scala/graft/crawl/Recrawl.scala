package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adaptive recrawl scheduling — the policy layer above T7's fixed
  * staleness reseed: estimate each url's CHANGE RATE from its observation
  * history and size the revisit interval to it (the Cho & Garcia-Molina
  * "Effective Page Refresh Policies" estimator family, kept integer-exact).
  *
  * Input: one row per fetch observation (url, vt, hash) — exactly what the
  * engine's snapshots table records per GET (content hash per visit).
  *
  * Per url with ≥2 observations:
  *   - `n_changes`: visits whose hash differs from the previous visit's
  *     (lag over vt order) — the detected-change count,
  *   - `change_rate_micro = n_changes·10⁶ div (n_obs−1)` — detected
  *     changes per revisit opportunity,
  *   - `suggested_interval_sec = clamp(base·(n_obs−1) div max(n_changes,1),
  *     min, max)` — revisit ∝ 1/rate: a page that changed every visit
  *     recrawls at `base`; a never-changed page backs off
  *     multiplicatively with history length (base·(n_obs−1)) until it
  *     parks at `max`.
  *
  * Integer arithmetic throughout (micro-units + div) so the scores
  * hash-compare across engines. Plan shape: the lag window and the groupBy
  * both key on url — ONE exchange serves both (Catalyst reuses the
  * partitioning), then narrow (url, counters) rows; at 10^10 urls this is
  * a single url-keyed pass over the snapshots log, and the output joins
  * the frontier by url to reprioritize (the stalenessPriority lane). */
object Recrawl {

  def changeRates(observations: DataFrame, baseSec: Long = 86400L,
      minSec: Long = 3600L, maxSec: Long = 2592000L): DataFrame = {
    val w = Window.partitionBy("url").orderBy("vt")
    val ch = observations
      .withColumn("prev_", lag(col("hash"), 1).over(w))
      .withColumn("chg_",
        when(col("prev_").isNotNull && col("prev_") =!= col("hash"), 1L)
          .otherwise(0L))
    ch.groupBy("url")
      .agg(count(lit(1)).as("n_obs"), sum("chg_").as("n_changes"))
      .filter(col("n_obs") >= 2)
      .withColumn("change_rate_micro",
        expr("n_changes * 1000000 div (n_obs - 1)"))
      .withColumn("suggested_interval_sec",
        least(greatest(
          expr(s"${baseSec}L * (n_obs - 1) div greatest(n_changes, 1L)"),
          lit(minSec)), lit(maxSec)))
  }
}
