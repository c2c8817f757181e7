package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.DynamicBench
import graft.sources.{MetricLogs, Tables}

/** The reference's `simulate_dynamic_updates_*` entry point re-expressed
  * (SURVEY §3.1): runs the phase harness over the embeddings fixture and
  * writes the interval log in the reference's exact text format
  * (`logs/dynamic_updates_spark.txt` analog under target/).
  * Usage: runMain graft.tools.DynamicUpdatesRun [sfDir] [outDir]
  */
object DynamicUpdatesRun {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "target/logs"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val cutoff = 250L * (dir.split("sf").last.toDouble / 0.001).round.max(1)
    val log = DynamicBench.dynamicUpdateRun(spark, queries, base, cutoff, k = 10)
    new java.io.File(out).mkdirs()
    // searches only, reference line format (sentinel rows become events)
    val lines = MetricLogs.formatLines(
      log.filter(org.apache.spark.sql.functions.col("qps") > 0))
      .collect().map(_.getString(0))
    val path = java.nio.file.Paths.get(s"$out/dynamic_updates_spark.txt")
    java.nio.file.Files.write(path,
      ("--- 50% Update ---" +: lines).mkString("\n").getBytes)
    println(s"wrote ${lines.length} intervals to $path")
    log.show(50, false)
    spark.stop()
  }
}
