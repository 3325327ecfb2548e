package graft.ops

import org.apache.spark.sql.DataFrame

/** Round-scoped localCheckpoint for iterative DataFrame algorithms
  * (PageRank, connected components, BFS): checkpoint the new round's frame
  * eagerly, then FREE the previous round's blocks.
  *
  * `localCheckpoint(true)` truncates lineage by materializing the frame as
  * persistent RDD blocks — but those blocks live OUTSIDE the CacheManager
  * (`Dataset.unpersist()` does not touch them; they wait for a driver GC +
  * ContextCleaner pass, which a large-heap driver may never run). An
  * iterative op that checkpoints every round therefore accumulates one
  * full copy of its state per round: at 10^10 nodes × 20 rounds that is
  * 20 node-set copies spilled across executor disks. The cure is the same
  * as the Scheduler's per-wave watermark: track exactly the persistent-RDD
  * ids each checkpoint created and drop them as soon as the NEXT round's
  * checkpoint (derived from them) is materialized.
  */
private[ops] final class IterCheckpoint(spark: org.apache.spark.sql.SparkSession) {

  private var lastIds: Set[Int] = Set.empty

  /** Eagerly checkpoint `df`, then free the blocks of the PREVIOUS frame
    * this instance checkpointed (safe: the new checkpoint is already
    * materialized, so nothing reads the old blocks again). Frames the
    * caller must keep across all rounds (edge lists, node catalogs)
    * should use a plain `localCheckpoint(true)`, not this. */
  def next(df: DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint(true)
    val created = sc.getPersistentRDDs.keySet -- before
    free()
    lastIds = created.toSet
    ck
  }

  /** Free the last checkpoint's blocks (call after the final result has
    * been consumed or re-materialized — NOT before returning a frame that
    * still reads them). */
  def free(): Unit = {
    val rdds = spark.sparkContext.getPersistentRDDs
    lastIds.foreach(id => rdds.get(id).foreach(_.unpersist(blocking = false)))
    lastIds = Set.empty
  }
}
