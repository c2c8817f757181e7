package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the blocked ZCA adjacency's edge recall vs the exact ZCA
  * adjacency (the `hubness_cellblocked_quality` comparison, run in the
  * TRANSFORMED space) — the number behind SCALING.md's census-agreement
  * row for `hubness_zca_cellblocked`. */
object ZcaEdgeRecall {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    dirs.foreach { dir =>
      val (exact, blocked) = graft.SparkEntry.zcaAdjPairForProbe(spark, dir)
      val e = exact.select(col("node_id"), col("neighbor_id"))
      val b = blocked.select(col("node_id"), col("neighbor_id"))
      val nE = e.count()
      val nB = b.count()
      val hits = e.join(b, Seq("node_id", "neighbor_id"), "left_semi").count()
      println(f"[zca-recall] $dir exact=$nE blocked=$nB hits=$hits recall=${hits.toDouble / nE}%.4f")
    }
    spark.stop()
  }
}
