package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named catalog queries to
  * per-query text files — the plan evidence the optimization round commits
  * under plans/rNN/. Session conf mirrors the bench's catalog phase
  * (local[$SPARK_GRAFT_CPUS], core-count shuffle partitions, AQE coalescing
  * off) so the dumped plans are the bench-shaped ones.
  *
  * usage: runMain graft.PlanDump <outDir> <suffix> <sfDir> <name> [<name>...]
  * writes <outDir>/<name>_<suffix>.txt
  *
  * NOTE for iterative/eager operators (connected components, PageRank,
  * semDedup, k-means training): explain shows only the LAZY tail of the
  * returned frame — the per-round loop plans are eager and internal. Their
  * shape evidence lives in the plan-pinning specs (DedupSpec/OpsSpec/
  * ScaleCrawlSpec) instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val txt =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case t: Throwable => s"PLAN UNAVAILABLE: ${t.getClass.getName}: ${t.getMessage}" }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
