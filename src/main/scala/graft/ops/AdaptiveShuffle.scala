package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped, data-sized shuffle layout for EAGER iterative sections (connected
  * components, PageRank/HITS power iterations, BFS, pointer doubling).
  *
  * The bench/driver session pins `spark.sql.shuffle.partitions` to the core
  * count and disables AQE partition coalescing globally because blob-heavy
  * exchanges (page bodies, WARC payloads) coalesce into a handful of fat
  * partitions and serialize the cluster. Iterative graph/dedup rounds are the
  * opposite regime: every exchange carries NARROW fixed-width rows (two
  * longs), and each round launches several shuffle stages whose reduce-task
  * count would otherwise be a constant tuned to neither the data nor the
  * machine — at toy scale that is pure task-scheduling overhead (measured:
  * ~0.6 s/round for ~1k-edge rounds at 32 partitions), at cluster scale it
  * is the M×R shuffle-block blowup of guide-§2.2.
  *
  * So inside these sections we re-enable AQE coalescing and turn off
  * `parallelismFirst`, which makes AQE size every reduce stage to
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (64 MB default) from
  * RUNTIME map-output statistics — the scale-adaptive rule the optimization
  * guide prescribes (size partitions to the data, never a fixed constant).
  * The session's layout is restored on exit, so surrounding queries keep the
  * round's pinned configuration.
  */
private[graft] object AdaptiveShuffle {

  private val Overrides = Seq(
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    // target advisory bytes (64 MB), not max parallelism: narrow-row rounds
    // want few well-filled reduce tasks, exactly guide §2.2
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false")

  /** Run `body` (which may trigger eager jobs) under the narrow-row layout;
    * restore the caller's conf afterwards. The DataFrame a body RETURNS is
    * lazy and executes under the caller's own configuration. */
  def narrowRows[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val saved = Overrides.map { case (k, _) => k -> conf.getOption(k) }
    Overrides.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
