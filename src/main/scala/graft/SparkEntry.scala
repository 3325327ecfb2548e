package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Funcs
import graft.ops.{Dedup, Similarity, TextAnalysis, Multimodal}

/** Driver contract: the operator catalog (SURVEY.md §2) exposed as named
  * queries over the driver-provided parquet tables, each with a DuckDB
  * oracle where the semantics are ANSI-SQL-expressible. Crawl-engine
  * operators that have no SQL twin (UDF kernels, LSH pipelines, the crawl
  * loop itself) are surfaced as rows-only queries.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Synthetic url column shared by the url-shaped operators; the DuckDB
    * oracle reconstructs the identical strings (see urlsSql). */
  private def urlCol(docId: Column): Column = concat(
    when(docId % 10 === 0, lit("ftp")).when(docId % 10 === 1, lit("mailto"))
      .otherwise(lit("http")),
    lit("://site"), (docId % 50).cast("string"), lit(".example.com/doc/"),
    docId.cast("string"),
    when(docId % 7 === 0, lit(".pdf")).otherwise(lit(".html")))

  private val urlsSql =
    """concat(CASE WHEN doc_id % 10 = 0 THEN 'ftp' WHEN doc_id % 10 = 1 THEN 'mailto' ELSE 'http' END,
      | '://site', CAST(doc_id % 50 AS VARCHAR), '.example.com/doc/', CAST(doc_id AS VARCHAR),
      | CASE WHEN doc_id % 7 = 0 THEN '.pdf' ELSE '.html' END)""".stripMargin.replace("\n", "")

  /** Flagship: multi-aggregate scan (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- scans / sorts / pagination (S1, O1, O2)
    "s1_scan_paginate" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .offset(50).limit(100)
    }),
    "s2_point_lookup" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_orderkey") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    }),
    "o1_topk" -> ((s, d) => {
      t(s, d, "orders").orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice").limit(100)
    }),

    // ---------------- filters / predicates (P2, P3, P10, P13)
    "p2_scheme_filter" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"), urlCol(col("doc_id")).as("url"))
        .filter(col("url").startsWith("http://") || col("url").startsWith("https://"))
    }),
    "p3_staleness_gate" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cutoff = ev.agg((max(col("ts")) - expr("INTERVAL 7 DAY")).as("cutoff"))
      ev.crossJoin(broadcast(cutoff)).filter(col("ts") < col("cutoff"))
        .select("event_id", "user_id", "ts")
    }),
    "p10_null_split" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("source")).as("maybe_src"))
        .filter(col("maybe_src").isNotNull)
    }),
    "p13_ilike_search" -> ((s, d) => {
      t(s, d, "documents")
        .filter(lower(col("source")).contains("src1"))
        .orderBy("doc_id").select("doc_id", "source").limit(50)
    }),

    // P5: SuspectedContentUrl UDF validated against the synthesized truth
    // (.pdf urls are content; .html is a notContent extension)
    "p5_suspected_content" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        Funcs.suspectedContentUdf(urlCol(col("doc_id")), lit("")).as("suspected"))
    }),
    // P6: host whitelist semi-join; host extracted by the Go-parity parser,
    // oracle reconstructs hosts arithmetically
    "p6_host_whitelist" -> ((s, d) => {
      val urls = t(s, d, "documents").select(col("doc_id"), urlCol(col("doc_id")).as("url"))
        .withColumn("host", Funcs.hostUdf(col("url")))
      val wl = s.createDataFrame(Seq(Tuple1("site7.example.com"), Tuple1("site9.example.com"),
        Tuple1("site23.example.com"))).toDF("host")
      urls.join(broadcast(wl), Seq("host"), "left_semi").select("doc_id", "url", "host")
    }),
    // P7: Source.MatchesUrl containment (strings.Contains, source.go:112-119)
    "p7_matches_url" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"), urlCol(col("doc_id")).as("url"))
        .filter(col("url").contains("doc/1"))
    }),
    // F2: Go net/url component extraction validated against constructed truth
    "f2_url_parts" -> ((s, d) => {
      val u = urlCol(col("doc_id"))
      t(s, d, "documents").select(col("doc_id"),
        Funcs.schemeUdf(u).as("scheme"), Funcs.hostUdf(u).as("host"),
        Funcs.pathUdf(u).as("path"))
    }),
    // S5: WARC-shaped record emit (core/url.go:146-158)
    "s5_warc_emit" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        concat(lit("<urn:sha256:"), sha2(col("text").cast("binary"), 256), lit(">"))
          .as("warc_record_id"),
        urlCol(col("doc_id")).as("warc_target_uri"),
        col("n_chars").as("content_length"))
    }),
    // A9: bloom URL-seen prefilter + exact confirm — must equal the exact
    // anti-join (the j8 oracle re-used as this query's oracle)
    "a9_bloom_seen" -> ((s, d) => {
      import graft.crawl.Bloom
      val docs = t(s, d, "documents")
      val cand = docs.filter(col("doc_id") < 300).select(urlCol(col("doc_id")).as("url"))
      val seen = docs.filter(col("doc_id") % 3 === 0).select(urlCol(col("doc_id")).as("url"))
      val bloom = Bloom.build(s, seen, "url", 65536)
      val hit = Bloom.mightContainCol(s, bloom, col("url"))
      val tagged = cand.withColumn("hit", hit)
      tagged.filter(!col("hit")).select("url")
        .unionByName(tagged.filter(col("hit")).select("url")
          .join(seen, Seq("url"), "left_anti"))
    }),
    // F10: headers [k,v,...] slice <-> map round trip (url.go:139-144,514-522)
    "f10_headers_map" -> ((s, d) => {
      val hdrs = array(lit("Content-Length"), col("n_chars").cast("string"),
        lit("Content-Type"), lit("text/plain; charset=utf-8"))
      t(s, d, "documents").select(col("doc_id"), hdrs.as("headers"),
        map_from_arrays(
          filter(transform(hdrs, (x, i) => when(i % 2 === 0, x)), _.isNotNull),
          filter(transform(hdrs, (x, i) => when(i % 2 === 1, x)), _.isNotNull))
          .as("headers_map"))
    }),

    // ---------------- joins (J1, J4, J5, J6, J7, J8)
    "j1_equi_join" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    }),
    "j4_join_sort_limit" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
        .select("o_orderkey", "c_name", "o_orderdate").limit(20)
    }),
    "j5_semi_exists" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),
    "j6_anti_not_exists" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),
    "j7_containment_theta" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cand = docs.filter(col("doc_id") < 200)
        .select(urlCol(col("doc_id")).as("c_url"))
      val prefs = docs.filter(col("doc_id") < 20)
        .select(concat(lit("doc/"), col("doc_id").cast("string")).as("pref"))
      cand.join(broadcast(prefs), expr("c_url LIKE concat('%', pref, '%')"))
        .select("c_url", "pref")
    }),
    "j8_frontier_seen_anti" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cand = docs.filter(col("doc_id") < 300)
        .select(urlCol(col("doc_id")).as("url"))
      val seen = docs.filter(col("doc_id") % 3 === 0)
        .select(urlCol(col("doc_id")).as("url"))
      cand.join(seen, Seq("url"), "left_anti")
    }),

    // ---------------- aggregates (A1, A2, A3, A5, A6, A7)
    "a1_count_global" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n_rows"))),
    "a2_groupby_count" -> ((s, d) =>
      t(s, d, "documents").groupBy("source").agg(count(lit(1)).as("n"))),
    "a3_multi_agg" -> ((s, d) => {
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("cnt"))
    }),
    "a5_hierarchical_rollup" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_customers"),
          round(sum("c_acctbal"), 2).as("sum_acctbal"))
    }),
    "a6_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      t(s, d, "events").withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "ts")
    }),
    "a7_filtered_count" -> ((s, d) =>
      t(s, d, "events").groupBy("event_type").agg(count(lit(1)).as("n"))),

    // ---------------- set ops (§2.6)
    "u1_union_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val a = docs.filter(col("doc_id") < 100).select(urlCol(col("doc_id")).as("url"))
      val b = docs.filter(col("doc_id").between(50, 150)).select(urlCol(col("doc_id")).as("url"))
      a.unionByName(b).distinct()
    }),

    // ---------------- windows / streaming-shaped (A6 twin, T-series)
    "w1_running_count" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("running_n"))
    }),
    "st1_tumbling_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("win.start").as("win_start"), col("event_type"), col("n"))
    }),

    // ---------------- scalar functions (F3, F6, F9, F11)
    "f3_filename" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        regexp_extract(urlCol(col("doc_id")), "[^/]*$", 0).as("file_name"))
    }),
    "f6_multihash" -> ((s, d) => {
      t(s, d, "documents").select(col("doc_id"),
        concat(lit("1220"), sha2(col("text").cast("binary"), 256)).as("doc_hash"))
    }),
    "f9_extract_links" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 100)
      val base = concat(lit("http://site"), (col("doc_id") % 50).cast("string"),
        lit(".example.com/doc/"), col("doc_id").cast("string"), lit(".html"))
      val html = concat(
        lit("<html><body><a href=\"/d/"), col("doc_id").cast("string"),
        lit("\">x</a><a href=\"rel"), (col("doc_id") % 7).cast("string"),
        lit(".html\">y</a></body></html>"))
      docs.select(col("doc_id"), posexplode(
          Funcs.extractLinksUdf(base, html.cast("binary"))).as(Seq("href_idx", "link")))
        .select("doc_id", "href_idx", "link")
    }),
    "f11_date_trunc" -> ((s, d) => {
      t(s, d, "events").select(col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        date_trunc("hour", col("ts")).as("ts_hour"))
    }),

    // ---------------- dedup suite (training-data ops)
    "d1_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("text_hash"))
        .groupBy("text_hash")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
    }),
    "d2_minhash_pairs" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), k = 3, numHashes = 64, bands = 16,
        minEstJaccard = 0.5)),
    "d3_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 3)),
    "d4_jaccard_verified" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cands = Dedup.minhashPairs(docs, k = 3, numHashes = 64, bands = 16,
        minEstJaccard = 0.3)
      Dedup.verifyJaccard(cands, docs, k = 3, minJaccard = 0.6)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
    }),
    "d5_embed_exact_dup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      e.alias("a").join(e.alias("b"),
          col("a.embedding") === col("b.embedding") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    }),
    "d6_embed_cosine_pairs" -> ((s, d) =>
      Dedup.embeddingDupPairs(t(s, d, "embeddings"), dim = 64, planes = 12,
        minCosine = 0.95).select(col("a_id"), col("b_id"),
          round(col("cosine"), 4).as("cosine"))),

    // ---------------- similarity search
    "ann1_bruteforce_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.bruteForceTopK(e, q, k = 10)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),
    "ann2_lsh_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.lshTopK(e, q, dim = 64, k = 10)
        .select(col("query_id"), col("vec_id"), col("rank"))
    }),

    // ---------------- text analysis
    "t1_lang_dist" -> ((s, d) =>
      t(s, d, "documents").groupBy("lang").agg(count(lit(1)).as("n"))),
    "t2_quality_signals" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val txt = col("text")
      val chars = length(txt).cast("long")
      val toks = when(length(trim(txt)) === 0, lit(0L))
        .otherwise((length(trim(txt)) - length(replace(trim(txt), lit(" "), lit(""))) + 1).cast("long"))
      docs.select(col("doc_id"), chars.as("n_chars_c"), toks.as("n_tokens"),
        when(toks > 0, round(chars.cast("double") / toks, 4)).otherwise(lit(0.0))
          .as("mean_tok_len"))
    }),
    "t3_token_count" -> ((s, d) => {
      val txt = col("text")
      t(s, d, "documents").select(col("doc_id"),
        when(length(trim(txt)) === 0, lit(0L))
          .otherwise((length(trim(txt)) - length(replace(trim(txt), lit(" "), lit(""))) + 1).cast("long"))
          .as("n_tokens"))
    }),
    "t6_extract_text" -> ((s, d) => {
      // visible-text extraction over synthesized html; oracle reconstructs
      // the expected text arithmetically
      val html = concat(lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><script>var x=1;</script></head><body><p>alpha "),
        col("doc_id").cast("string"), lit("</p><!-- hidden --><p>beta</p></body></html>"))
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          Funcs.extractTextUdf(html.cast("binary")).as("page_text"))
    }),
    "t4_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.fingerprintUdf(col("text")).as("fingerprint"))),
    "t5_langid_detect" -> ((s, d) =>
      TextAnalysis.withLanguage(t(s, d, "documents"))
        .select("doc_id", "lang", "lang_detected")),

    // ---------------- multimodal plumbing (stubbed decode, real schema)
    "m1_media_meta" -> ((s, d) =>
      Multimodal.mediaMeta(
        t(s, d, "documents").select(col("doc_id"), col("text").cast("binary").as("content")),
        "content").select("doc_id", "media_hash", "format", "width", "height", "n_bytes")),

    // ---------------- crawl-native operators (no SQL twin; rows-only)
    "f1_normalize" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Funcs.normalizeUdf(concat(lit("HTTP://Site"), (col("doc_id") % 50).cast("string"),
          lit(".Example.COM:80//a/./doc/../d/"), col("doc_id").cast("string"))).as("normalized"))),
    "f5_sniff" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        Funcs.sniffUdf(col("text").cast("binary")).as("content_sniff"))),
    "crawl1_fixture_urls" -> ((s, _) =>
      CrawlFixture.urls(s)),
    "crawl2_fixture_links" -> ((s, _) =>
      CrawlFixture.links(s)),
    "crawl3_fixture_order" -> ((s, _) =>
      CrawlFixture.fetchLog(s))
  )

  def oracleSql: Map[String, String] = Map(
    "s1_scan_paginate" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_orderdate DESC, o_orderkey LIMIT 100 OFFSET 50",
    "s2_point_lookup" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem WHERE l_orderkey = 1",
    "o1_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "p2_scheme_filter" ->
      s"SELECT doc_id, url FROM (SELECT doc_id, $urlsSql AS url FROM documents) WHERE url LIKE 'http://%' OR url LIKE 'https://%'",
    "p3_staleness_gate" ->
      "SELECT event_id, user_id, ts FROM events WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 7 DAY",
    "p10_null_split" ->
      "SELECT doc_id, maybe_src FROM (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS maybe_src FROM documents) WHERE maybe_src IS NOT NULL",
    "p13_ilike_search" ->
      "SELECT doc_id, source FROM documents WHERE lower(source) LIKE '%src1%' ORDER BY doc_id LIMIT 50",
    "j1_equi_join" ->
      "SELECT o_orderkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey",
    "j4_join_sort_limit" ->
      "SELECT o_orderkey, c_name, o_orderdate FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderdate DESC, o_orderkey LIMIT 20",
    "j5_semi_exists" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "j6_anti_not_exists" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "j7_containment_theta" ->
      s"""SELECT c_url, pref FROM (SELECT $urlsSql AS c_url FROM documents WHERE doc_id < 200) c JOIN (SELECT concat('doc/', CAST(doc_id AS VARCHAR)) AS pref FROM documents WHERE doc_id < 20) p ON c_url LIKE concat('%', pref, '%')""",
    "j8_frontier_seen_anti" ->
      s"""SELECT url FROM (SELECT $urlsSql AS url FROM documents WHERE doc_id < 300) WHERE url NOT IN (SELECT $urlsSql AS url FROM documents WHERE doc_id % 3 = 0)""",
    "p5_suspected_content" ->
      "SELECT doc_id, (doc_id % 7 = 0) AS suspected FROM documents",
    "p6_host_whitelist" ->
      s"""SELECT doc_id, url, host FROM (SELECT doc_id, $urlsSql AS url, concat('site', CAST(doc_id % 50 AS VARCHAR), '.example.com') AS host FROM documents) WHERE host IN ('site7.example.com', 'site9.example.com', 'site23.example.com')""",
    "p7_matches_url" ->
      s"SELECT doc_id, url FROM (SELECT doc_id, $urlsSql AS url FROM documents) WHERE url LIKE '%doc/1%'",
    "f2_url_parts" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 10 = 0 THEN 'ftp' WHEN doc_id % 10 = 1 THEN 'mailto' ELSE 'http' END AS scheme,
        | concat('site', CAST(doc_id % 50 AS VARCHAR), '.example.com') AS host,
        | concat('/doc/', CAST(doc_id AS VARCHAR), CASE WHEN doc_id % 7 = 0 THEN '.pdf' ELSE '.html' END) AS path
        | FROM documents""".stripMargin.replace("\n", ""),
    "s5_warc_emit" ->
      s"SELECT doc_id, concat('<urn:sha256:', sha256(text), '>') AS warc_record_id, $urlsSql AS warc_target_uri, n_chars AS content_length FROM documents",
    "a9_bloom_seen" ->
      s"""SELECT url FROM (SELECT $urlsSql AS url FROM documents WHERE doc_id < 300) WHERE url NOT IN (SELECT $urlsSql AS url FROM documents WHERE doc_id % 3 = 0)""",
    "a1_count_global" -> "SELECT count(*) AS n_rows FROM lineitem",
    "a2_groupby_count" -> "SELECT source, count(*) AS n FROM documents GROUP BY source",
    "a3_multi_agg" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "a5_hierarchical_rollup" ->
      "SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_acctbal FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
    "a6_latest_per_key" ->
      "SELECT user_id, event_id, event_type, ts FROM events QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1",
    "a7_filtered_count" -> "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "u1_union_dedup" ->
      s"""SELECT DISTINCT url FROM (SELECT $urlsSql AS url FROM documents WHERE doc_id < 100 UNION ALL SELECT $urlsSql AS url FROM documents WHERE doc_id BETWEEN 50 AND 150)""",
    "w1_running_count" ->
      "SELECT event_id, user_id, count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n FROM events",
    "st1_tumbling_window" ->
      "SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n FROM events GROUP BY 1, 2",
    "f3_filename" ->
      s"SELECT doc_id, regexp_extract($urlsSql, '[^/]*$$', 0) AS file_name FROM documents",
    "f6_multihash" ->
      "SELECT doc_id, concat('1220', sha256(text)) AS doc_hash FROM documents",
    "f9_extract_links" ->
      """SELECT doc_id, 0 AS href_idx, concat('http://site', CAST(doc_id % 50 AS VARCHAR), '.example.com/d/', CAST(doc_id AS VARCHAR)) AS link FROM documents WHERE doc_id < 100
        | UNION ALL
        | SELECT doc_id, 1 AS href_idx, concat('http://site', CAST(doc_id % 50 AS VARCHAR), '.example.com/doc/rel', CAST(doc_id % 7 AS VARCHAR), '.html') AS link FROM documents WHERE doc_id < 100""".stripMargin.replace("\n", ""),
    "f11_date_trunc" ->
      "SELECT event_id, date_trunc('second', ts) AS ts_sec, date_trunc('hour', ts) AS ts_hour FROM events",
    "d1_dedup_exact" ->
      "SELECT text_hash, min(doc_id) AS keep_id, count(*) AS dup_count FROM (SELECT doc_id, sha256(text) AS text_hash FROM documents) GROUP BY text_hash",
    "d5_embed_exact_dup" ->
      "SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM embeddings a JOIN embeddings b ON a.embedding = b.embedding AND a.vec_id < b.vec_id",
    "t1_lang_dist" -> "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "t6_extract_text" ->
      "SELECT doc_id, concat('Doc ', CAST(doc_id AS VARCHAR), ' alpha ', CAST(doc_id AS VARCHAR), ' beta') AS page_text FROM documents WHERE doc_id < 200",
    "t2_quality_signals" ->
      "SELECT doc_id, length(text) AS n_chars_c, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS n_tokens, CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE round(CAST(length(text) AS DOUBLE) / (length(trim(text)) - length(replace(trim(text), ' ', '')) + 1), 4) END AS mean_tok_len FROM documents",
    "t3_token_count" ->
      "SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END AS n_tokens FROM documents"
  )
}

/** Runs the fixture-site crawl once per JVM and serves its output tables
  * (the crawl engine surfaced through the driver's correctness gate). */
object CrawlFixture {
  import graft.crawl._
  private var cached: Option[(SparkSession, Scheduler)] = None

  private def sched(spark: SparkSession): Scheduler = synchronized {
    cached match {
      case Some((s, sc)) if s eq spark => sc
      case _ =>
        val store = new TableStore(spark,
          java.nio.file.Files.createTempDirectory("crawl-entry").toString)
        val sc = new Scheduler(spark, store, CrawlConfig())
        sc.bootstrap(
          Fixtures.pagesDF(spark, Fixtures.staticSitePages),
          Fixtures.sourcesDF(spark, Fixtures.staticSiteSources))
        sc.run(maxWaves = 40)
        cached = Some((spark, sc))
        sc
    }
  }

  def urls(spark: SparkSession): DataFrame =
    sched(spark).urlsView.select("url", "status", "content_sniff", "title",
      "last_get", "last_head", "content_length")
  def links(spark: SparkSession): DataFrame =
    sched(spark).linksView.select("src", "dst", "created")
  def fetchLog(spark: SparkSession): DataFrame =
    sched(spark).fetchLogView.select("wave", "vt", "host", "lane", "method",
      "url", "seq", "outcome")
}
