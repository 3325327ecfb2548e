package graft.crawl

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path CRUD for the catalog entities — the API-equivalent mutation
  * surface behind the reference's handlers (handlers.go:110-230) and query
  * constants:
  *
  *   - sources:    insert/update (queries.go:418-433), soft-delete —
  *     `UPDATE sources SET deleted=true` (queries.go:436-441)
  *   - primers:    insert/update (queries.go:294-310), soft-delete
  *     (qPrimerDelete, queries.go:312-315)
  *   - collections + collection_items: insert/update and HARD delete — the
  *     reference really issues `DELETE FROM` here (queries.go:36-46, 62-65,
  *     76-89)
  *   - metadata:   hash-chained append (qMetadataInsert, queries.go:260-264;
  *     NextMetadata's prev = latest hash for (key_id, subject),
  *     metadata.go:124-144) with prev validation
  *
  * Storage shape: these catalogs are human-curated and small (thousands of
  * rows, not 10^10), so each mutation is a read-modify-rewrite staged
  * through a TableStore snapshot commit — the Iceberg copy-on-write path
  * for small dimension tables. Metadata is append-only (its semantics are a
  * hash chain; rows are never updated in the reference either).
  *
  * Determinism: ids are sha-derived (SURVEY §7.4 replaces uuid.New());
  * timestamps are caller-provided virtual times (the engine's vt clock).
  */
final class Mutations(spark: SparkSession, store: TableStore) {
  import spark.implicits._

  private def ts(sec: Long): Timestamp =
    new Timestamp(Model.VirtualEpoch.getTime + sec * 1000L)

  private def readOr(table: String, empty: => DataFrame): DataFrame =
    store.readLatest(table).getOrElse(empty)

  private def commit(table: String, df: DataFrame): Unit = {
    store.resetPending()
    store.stageRewrite(table, df)
    store.commitWave(store.currentWave)
  }

  // ------------------------------------------------------------- sources

  private def emptySources: DataFrame =
    spark.emptyDataset[Model.SourceRow].toDF()

  def sources: DataFrame = {
    val df = readOr("sources", emptySources)
    if (df.columns.contains("deleted")) df
    else df.withColumn("deleted", lit(false))
  }

  /** qSourceInsert guarded by the url UNIQUE constraint
    * (qSourceExistsByUrl): returns the existing id instead of duplicating. */
  def createSource(url: String, title: String, primerId: String,
      crawl: Boolean, vtSec: Long,
      staleDurationMs: Long = 43200000L): String = {
    val cur = sources
    val existing = cur.filter($"url" === url).select("id").limit(1).collect()
    if (existing.nonEmpty) return existing.head.getString(0)
    val id = graft.functions.Hashing.urlId("source:" + url)
    val row = Seq(Model.SourceRow(id, url, title, ts(vtSec), ts(vtSec),
      primerId, crawl, staleDurationMs)).toDF()
    commit("sources", cur.unionByName(row))
    id
  }

  /** qSourceUpdate: full-row update by id, ignored when soft-deleted. */
  def updateSource(id: String, title: Option[String] = None,
      crawl: Option[Boolean] = None, vtSec: Long): Unit = {
    val cur = sources
    val hit = $"id" === id && !$"deleted"
    var upd = cur.withColumn("updated",
      when(hit, lit(ts(vtSec))).otherwise($"updated"))
    title.foreach(t => upd = upd.withColumn("title",
      when(hit, lit(t)).otherwise($"title")))
    crawl.foreach(c => upd = upd.withColumn("crawl",
      when(hit, lit(c)).otherwise($"crawl")))
    commit("sources", upd)
  }

  /** qSourceDelete (queries.go:436-441): soft delete BY URL. */
  def deleteSourceByUrl(url: String): Unit =
    commit("sources", sources.withColumn("deleted",
      when($"url" === url, lit(true)).otherwise($"deleted")))

  // ------------------------------------------------------------- primers

  private def emptyPrimers: DataFrame =
    Seq.empty[(String, Timestamp, Timestamp, String, String, String, String, Boolean)]
      .toDF("id", "created", "updated", "short_title", "title", "description",
        "parent_id", "deleted")

  def primers: DataFrame = readOr("primers", emptyPrimers)

  def createPrimer(shortTitle: String, title: String, description: String,
      parentId: String, vtSec: Long): String = {
    val id = graft.functions.Hashing.urlId("primer:" + shortTitle + ":" + title)
    val row = Seq((id, ts(vtSec), ts(vtSec), shortTitle, title, description,
      parentId, false))
      .toDF("id", "created", "updated", "short_title", "title", "description",
        "parent_id", "deleted")
    commit("primers", primers.filter($"id" =!= id).unionByName(row))
    id
  }

  def updatePrimer(id: String, title: Option[String] = None,
      description: Option[String] = None, vtSec: Long): Unit = {
    val hit = $"id" === id && !$"deleted"
    var upd = primers.withColumn("updated",
      when(hit, lit(ts(vtSec))).otherwise($"updated"))
    title.foreach(t => upd = upd.withColumn("title",
      when(hit, lit(t)).otherwise($"title")))
    description.foreach(d => upd = upd.withColumn("description",
      when(hit, lit(d)).otherwise($"description")))
    commit("primers", upd)
  }

  /** qPrimerDelete: soft delete. */
  def deletePrimer(id: String): Unit =
    commit("primers", primers.withColumn("deleted",
      when($"id" === id, lit(true)).otherwise($"deleted")))

  /** qPrimerSubPrimers (queries.go:317-325). */
  def subPrimers(parentId: String): DataFrame =
    primers.filter(!$"deleted" && $"parent_id" === parentId)

  /** qPrimerSources (queries.go:327-336): live sources of a primer. */
  def primerSources(primerId: String): DataFrame =
    sources.filter(!$"deleted" && $"primer_id" === primerId)

  // ------------------------------------------------------- collections

  private def emptyCollections: DataFrame =
    Seq.empty[(String, Timestamp, Timestamp, String, String, String)]
      .toDF("id", "created", "updated", "creator", "title", "url")
  private def emptyItems: DataFrame =
    Seq.empty[(String, String, Long, String)]
      .toDF("collection_id", "url_id", "idx", "description")

  def collections: DataFrame = readOr("collections", emptyCollections)
  def collectionItems: DataFrame = readOr("collection_items", emptyItems)

  def createCollection(creator: String, title: String, url: String,
      vtSec: Long): String = {
    val id = graft.functions.Hashing.urlId("collection:" + creator + ":" + title)
    val row = Seq((id, ts(vtSec), ts(vtSec), creator, title, url))
      .toDF("id", "created", "updated", "creator", "title", "url")
    commit("collections", collections.filter($"id" =!= id).unionByName(row))
    id
  }

  /** qCollectionDelete + item cascade: the reference HARD-deletes. */
  def deleteCollection(id: String): Unit = {
    store.resetPending()
    store.stageRewrite("collections", collections.filter($"id" =!= id))
    store.stageRewrite("collection_items",
      collectionItems.filter($"collection_id" =!= id))
    store.commitWave(store.currentWave)
  }

  /** qCollectionItemInsert / qCollectionItemUpdate: upsert on the
    * (collection_id, url_id) key. */
  def putCollectionItem(collectionId: String, urlId: String, idx: Long,
      description: String): Unit = {
    val row = Seq((collectionId, urlId, idx, description))
      .toDF("collection_id", "url_id", "idx", "description")
    val rest = collectionItems
      .filter(!($"collection_id" === collectionId && $"url_id" === urlId))
    commit("collection_items", rest.unionByName(row))
  }

  /** qCollectionItemDelete: hard delete of one item. */
  def deleteCollectionItem(collectionId: String, urlId: String): Unit =
    commit("collection_items", collectionItems
      .filter(!($"collection_id" === collectionId && $"url_id" === urlId)))

  // ------------------------------------------------- peripheral catalogs

  private def emptyDataRepos: DataFrame =
    Seq.empty[(String, Timestamp, Timestamp, String, String, String, Boolean)]
      .toDF("id", "created", "updated", "title", "description", "url", "deleted")
  private def emptyCustomCrawls: DataFrame =
    Seq.empty[(String, Timestamp, Timestamp, String, String, Timestamp, String,
      String, String)]
      .toDF("id", "created", "updated", "jwt", "morph_run_id", "date_completed",
        "github_repo", "original_url", "sqlite_checksum")

  def dataRepos: DataFrame = readOr("data_repos", emptyDataRepos)
  def customCrawls: DataFrame = readOr("custom_crawls", emptyCustomCrawls)

  /** qDataRepoInsert (queries.go:113-116); schema queries.go:124-133. */
  def createDataRepo(title: String, description: String, url: String,
      vtSec: Long): String = {
    val id = graft.functions.Hashing.urlId("datarepo:" + url)
    val row = Seq((id, ts(vtSec), ts(vtSec), title, description, url, false))
      .toDF("id", "created", "updated", "title", "description", "url", "deleted")
    commit("data_repos", dataRepos.filter($"id" =!= id).unionByName(row))
    id
  }

  /** qDataRepoDelete is a HARD delete (queries.go:144-147). */
  def deleteDataRepo(id: String): Unit =
    commit("data_repos", dataRepos.filter($"id" =!= id))

  /** qCustomCrawlInsert (queries.go:834-839). */
  def createCustomCrawl(githubRepo: String, originalUrl: String,
      morphRunId: String, vtSec: Long): String = {
    val id = graft.functions.Hashing.urlId("customcrawl:" + originalUrl)
    val row = Seq((id, ts(vtSec), ts(vtSec), "", morphRunId, ts(vtSec),
      githubRepo, originalUrl, ""))
      .toDF("id", "created", "updated", "jwt", "morph_run_id", "date_completed",
        "github_repo", "original_url", "sqlite_checksum")
    commit("custom_crawls", customCrawls.filter($"id" =!= id).unionByName(row))
    id
  }

  // ------------------------------------------------------- uncrawlables

  /** The reference's full uncrawlables row (qUncrawlableCreateTable,
    * queries.go:729-751). The Scheduler's `markUncrawlable` writes a thin
    * (url, created) row into the same table; mergeSchema unions the two
    * shapes and every gate reads only `url`. */
  private def emptyUncrawlables: DataFrame =
    Seq.empty[(String, String, Timestamp, Timestamp, String, String, String)]
      .toDF("id", "url", "created", "updated", "name", "email", "comments")

  def uncrawlables: DataFrame = {
    val df = store.readAppendOnly("uncrawlables").getOrElse(emptyUncrawlables)
    // thin Scheduler rows read with null id/updated/name/... — normalize
    emptyUncrawlables.columns.foldLeft(df) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(if (c.endsWith("ed")) "timestamp" else "string"))
    }.select("id", "url", "created", "updated", "name", "email", "comments")
  }

  /** qUncrawlableInsert (queries.go:766-773): url is the PRIMARY KEY —
    * re-inserting an existing url updates it in place (upsert; the
    * reference's Save() routes to update when the row exists). */
  def createUncrawlable(url: String, name: String, email: String,
      comments: String, vtSec: Long): String = {
    val id = graft.functions.Hashing.urlId("uncrawlable:" + url)
    val row = Seq((id, url, ts(vtSec), ts(vtSec), name, email, comments))
      .toDF("id", "url", "created", "updated", "name", "email", "comments")
    commit("uncrawlables", uncrawlables.filter($"url" =!= url).unionByName(row))
    id
  }

  /** qUncrawlableUpdate (queries.go:775-784): full-row update by id. */
  def updateUncrawlable(id: String, name: Option[String] = None,
      email: Option[String] = None, comments: Option[String] = None,
      vtSec: Long): Unit = {
    val hit = $"id" === id
    var upd = uncrawlables.withColumn("updated",
      when(hit, lit(ts(vtSec))).otherwise($"updated"))
    name.foreach(v => upd = upd.withColumn("name", when(hit, lit(v)).otherwise($"name")))
    email.foreach(v => upd = upd.withColumn("email", when(hit, lit(v)).otherwise($"email")))
    comments.foreach(v => upd = upd.withColumn("comments",
      when(hit, lit(v)).otherwise($"comments")))
    commit("uncrawlables", upd)
  }

  /** qUncrawlableDelete (queries.go:806-808): HARD delete BY URL — this is
    * the un-block path: once the row is gone, the Scheduler's uncrawlables
    * gates stop filtering the url and it becomes enqueueable again (its
    * old frontier eviction tombstone is outranked by any later-wave
    * enqueue, so no store surgery is needed). */
  def deleteUncrawlable(url: String): Unit =
    commit("uncrawlables", uncrawlables.filter($"url" =!= url))

  /** qUncrawlablesList (queries.go:755-764). */
  def listUncrawlables(limit: Int, offset: Int): DataFrame =
    uncrawlables.orderBy(desc("created"), asc("url")).offset(offset).limit(limit)

  // ---------------------------------------------------------- metadata

  private def emptyMeta: DataFrame =
    Seq.empty[(String, Timestamp, String, String, String, String, Boolean)]
      .toDF("hash", "time_stamp", "key_id", "subject", "prev", "meta", "deleted")

  /** metadata reads the UNION of appended versions (append-only chain);
    * the soft-delete rewrite collapses history into one version, which the
    * union read then sees alone. */
  def metadata: DataFrame =
    store.readAppendOnly("metadata").getOrElse(emptyMeta)

  /** Latest chain head for (key_id, subject) — NextMetadata's prev source
    * (metadata.go:124-144); empty string when the chain is new. */
  def latestHash(keyId: String, subject: String): String = {
    val rows = metadata.filter($"key_id" === keyId && $"subject" === subject)
      .orderBy(desc("time_stamp"), desc("hash")).select("hash").limit(1).collect()
    if (rows.isEmpty) "" else rows.head.getString(0)
  }

  /** Hash-chained metadata append (qMetadataInsert): `prev` MUST equal the
    * current chain head for (key_id, subject) — a stale prev means a
    * concurrent writer advanced the chain; the append is rejected. The row
    * hash covers (time_stamp, key_id, subject, prev, meta) — the fields of
    * the reference's HashableBytes (metadata.go:146-162) — as a sha256
    * multihash of their canonical concatenation (deterministic field order
    * replaces Go's JSON marshal). */
  def putMetadata(keyId: String, subject: String, prev: String,
      metaJson: String, vtSec: Long): Either[String, String] = {
    val head = latestHash(keyId, subject)
    if (prev != head)
      return Left(s"stale prev: chain head is '$head', got '$prev'")
    val stamp = ts(vtSec)
    // hash a timezone-independent stamp (epoch millis): Timestamp.toString
    // renders in the JVM default zone, which would make the chain hash —
    // and thus every derived id — differ between hosts with different TZ
    // settings, breaking cross-environment reproducibility
    val hash = graft.functions.Hashing.multihash(
      s"${stamp.getTime}|$keyId|$subject|$prev|$metaJson"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val row = Seq((hash, stamp, keyId, subject, prev, metaJson, false))
      .toDF("hash", "time_stamp", "key_id", "subject", "prev", "meta", "deleted")
    store.resetPending()
    store.stageAppend("metadata", row)
    store.commitWave(store.currentWave)
    Right(hash)
  }

  /** Metadata soft-delete: a chain append whose body is null (the
    * reference marks deleted=true; the read queries filter it). */
  def deleteMetadata(keyId: String, subject: String, vtSec: Long): Unit = {
    commitMetaDeleted(keyId, subject)
  }

  private def commitMetaDeleted(keyId: String, subject: String): Unit = {
    store.resetPending()
    store.stageRewrite("metadata", metadata.withColumn("deleted",
      when($"key_id" === keyId && $"subject" === subject, lit(true))
        .otherwise($"deleted")))
    store.commitWave(store.currentWave)
  }
}
