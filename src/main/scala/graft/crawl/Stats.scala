package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The stats cron job (SURVEY §2.4 A2-A5, §2.8 T12): per-source url counts
  * and the recursive primer rollup sentry recomputes every 5h
  * (/root/reference/cron.go:12-45, core/primer.go:87-117, source.go:67-110).
  *
  * The reference counts per source with `url ilike '%'||s.url||'%'` scans
  * flagged "warning - big & slow" (queries.go:443-451); here it is one pass:
  * broadcast the source dimension, containment-match, aggregate — the scan
  * reads urls once for all sources. The primer tree (parent_id) is rolled up
  * bottom-up with an iterative groupBy loop — tree depth is tiny, so no
  * graph library is warranted.
  */
object Stats {

  /** Per-source counts (A2 urlCount, A3 contentUrlCount with the P11 filter,
    * A4 contentMetadataCount via a semi-join when metadata exists). */
  def sourceCounts(urls: DataFrame, sources: DataFrame,
      metadata: Option[DataFrame] = None): DataFrame = {
    val srcDim = sources.select(col("id").as("source_id"),
      col("url").as("src_pattern"), col("primer_id"))
    val matched = urls.join(broadcast(srcDim),
      urls("url").contains(col("src_pattern")))
    val isContent = col("hash") =!= "" &&
      col("hash") =!= graft.functions.Hashing.EmptyBodyHash &&
      col("content_sniff") =!= "text/html; charset=utf-8"
    val withMeta = metadata match {
      case Some(m) => matched.join(m.select(col("subject").as("hash")),
        Seq("hash"), "left_semi").groupBy("source_id")
        .agg(count(lit(1)).as("content_metadata_count"))
      case None => null
    }
    val base = matched.groupBy(col("source_id"), col("primer_id")).agg(
      count(lit(1)).as("url_count"),
      sum(when(isContent, 1).otherwise(0)).as("content_url_count"))
    metadata match {
      case Some(_) => base.join(withMeta, Seq("source_id"), "left")
        .withColumn("content_metadata_count",
          coalesce(col("content_metadata_count"), lit(0L)))
      case None => base.withColumn("content_metadata_count", lit(0L))
    }
  }

  /** Recursive primer rollup: each primer's stats = Σ own sources + Σ child
    * primers (primer.go:87-117). `primers(id, parent_id, title)`. */
  def primerRollup(primers: DataFrame, perSource: DataFrame): DataFrame = {
    val own = perSource.groupBy(col("primer_id").as("id")).agg(
      sum("url_count").as("url_count"),
      sum("content_url_count").as("content_url_count"),
      sum("content_metadata_count").as("content_metadata_count"))

    var totals = primers.select(col("id"), col("parent_id"))
      .join(own, Seq("id"), "left")
      .na.fill(0L, Seq("url_count", "content_url_count", "content_metadata_count"))
      .select("id", "parent_id", "url_count", "content_url_count",
        "content_metadata_count")

    // bottom-up: repeatedly add each node's subtotal into its parent until
    // nothing changes (depth-bounded; primer trees are shallow)
    val maxDepth = 16
    var childContrib = totals
    var depth = 0
    while (depth < maxDepth) {
      val up = childContrib.filter(col("parent_id").isNotNull &&
          col("parent_id") =!= "")
        .groupBy(col("parent_id").as("id")).agg(
          sum("url_count").as("u2"),
          sum("content_url_count").as("c2"),
          sum("content_metadata_count").as("m2"))
      if (up.isEmpty) depth = maxDepth
      else {
        totals = totals.join(up, Seq("id"), "left")
          .withColumn("url_count", col("url_count") + coalesce(col("u2"), lit(0L)))
          .withColumn("content_url_count",
            col("content_url_count") + coalesce(col("c2"), lit(0L)))
          .withColumn("content_metadata_count",
            col("content_metadata_count") + coalesce(col("m2"), lit(0L)))
          .drop("u2", "c2", "m2")
          .localCheckpoint()
        // next level: the parents' subtotals propagate one level further up
        childContrib = childContrib.filter(col("parent_id").isNotNull &&
            col("parent_id") =!= "")
          .join(primers.select(col("id").as("parent_id"),
            col("parent_id").as("grandparent")), Seq("parent_id"))
          .select(col("grandparent").as("parent_id"), col("url_count"),
            col("content_url_count"), col("content_metadata_count"))
          .localCheckpoint()
        if (childContrib.isEmpty) depth = maxDepth else depth += 1
      }
    }
    totals.select("id", "url_count", "content_url_count", "content_metadata_count")
  }
}
