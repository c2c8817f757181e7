package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev utility: time named SparkEntry queries in isolation.
  *
  * {{{
  * sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 pagerank_sharedgrams knn_mmr"
  * }}}
  *
  * Prints per-query wall-clock for two consecutive runs (cold + warm) so
  * hotspot work sees the same numbers the Bench harness reports without
  * paying for the other ~100 queries.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[time] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
