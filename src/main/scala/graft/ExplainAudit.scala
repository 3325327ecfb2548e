package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative catalog queries so the
  * plan shape (pushdown, pruning, broadcast, TakeOrdered, partial agg) can be
  * audited and pinned. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("s1_scan_paginate", "s2_point_lookup", "o1_topk",
      "j1_equi_join", "j5_semi_exists", "j8_frontier_seen_anti",
      "a3_multi_agg", "a6_latest_per_key", "d1_dedup_exact", "p13_ilike_search",
      "p16_domain_blocklist", "p17_url_features", "a11_change_rates",
      "t16_dsir_scores", "ann4_pq_topk", "h5_crawl_budget",
      "d17_substr_strip", "s10_warc_revisit")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
