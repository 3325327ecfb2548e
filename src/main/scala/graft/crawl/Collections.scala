package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Collections: ordered, curated lists of urls (core/collection.go; queries
  * core/queries.go:4-110) — collections (id, created, updated, creator,
  * title, url) and collection_items (collection_id, url_id, index,
  * description) joined to urls on urls.id = items.url_id.
  *
  * Scale shape: items⋈urls is an equi-join on the url multihash id — at
  * 100 TB both sides hash-partition on url_id; a single collection's page is
  * a pushed-filter scan (collection_id predicate) + broadcast-sized join.
  */
object Collections {

  /** qCollections (queries.go:15-21): reverse-chronological paginated list. */
  def list(collections: DataFrame, limit: Int, offset: Int): DataFrame =
    collections.orderBy(desc("created"), asc("id"))
      .select("id", "created", "title", "url")
      .offset(offset).limit(limit)

  /** qCollectionItems (queries.go:103-110): one collection's items joined to
    * urls, ordered by the curator-assigned index, paginated. */
  def items(items: DataFrame, urls: DataFrame, collectionId: String,
      limit: Int, offset: Int): DataFrame =
    items.filter(col("collection_id") === collectionId)
      .join(urls, items("url_id") === urls("id"))
      .orderBy(asc("idx"), asc("url_id"))
      .select(col("collection_id"), col("url_id"), col("url"), col("title"),
        col("idx"))
      .offset(offset).limit(limit)

  /** qCollectionLength (queries.go:100-101), generalized to all collections:
    * item count per collection (map-side combined). */
  def lengths(items: DataFrame): DataFrame =
    items.groupBy("collection_id").agg(count(lit(1)).as("n_items"))
}

/** Uncrawlables: the manually-curated don't-crawl list
  * (core/queries.go:729-751) — participates in the enqueue gate as an
  * anti-join (url NOT IN uncrawlables), alongside robots and the URL-seen
  * set. The list is human-scale (small) → broadcast anti-join.
  */
object Uncrawlables {

  /** Filter candidates (any frame with a url column) against the
    * uncrawlables list — qUncrawlableExistsByUrl as a relational gate. */
  def gate(candidates: DataFrame, uncrawlables: DataFrame,
      urlCol: String = "url"): DataFrame =
    candidates.join(
      broadcast(uncrawlables.select(col("url").as(urlCol)).distinct()),
      Seq(urlCol), "left_anti")
}
