package graft

import org.apache.spark.sql.SparkSession

/** Probe: does local-cluster mode (real separate executor JVMs) work here? */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse("local-cluster[2,4,4096]")
    val jar = new java.io.File("target/scala-2.13/sentryspark_2.13-0.1.0.jar")
      .getAbsolutePath
    val spark = SparkSession.builder()
      .master(master)
      .appName("cluster-probe")
      .config("spark.executor.memory", "4g")
      .config("spark.jars", jar)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // force a shuffle + a UDF (our classes must load on executors)
    val n = spark.range(0, 1000000, 1, 16)
      .map(i => graft.functions.GoUrl.hostOf(s"http://h${i % 100}.example.com/p$i"))
      .toDF("host").groupBy("host").count().count()
    println(s"PROBE OK distinct_hosts=$n executors=" +
      spark.sparkContext.getExecutorMemoryStatus.size)
    spark.stop()
  }
}
