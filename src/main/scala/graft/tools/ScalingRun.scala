package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.DynamicBench
import graft.sources.Tables

/** The reference's `evaluate_scaling_behavior` entry point (SURVEY §3.3):
  * concurrent clients share one snapshot; prints the M7 aggregate table
  * (mean latency / mean qps / sum qps / mean recall per client count).
  * Usage: runMain graft.tools.ScalingRun [sfDir] [clientCounts...]
  */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val counts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 4, 8)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val agg = DynamicBench.multiTenantRun(
      spark,
      Tables.embeddingQueries(spark, dir),
      Tables.embeddingBase(spark, dir),
      k = 10, clientCounts = counts)
    agg.orderBy("num_clients").show(false)
    spark.stop()
  }
}
