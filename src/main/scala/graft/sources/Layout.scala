package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout management — the piece that makes the index designs
  * actually prune at 100 TB:
  *
  *  - [[writeIvfPartitioned]]: persist the cluster-assigned base
  *    `partitionBy("cluster_id")`. An IVF probe that filters on
  *    `cluster_id` then becomes **partition pruning at the file level** —
  *    a 1000-executor scan reads nprobe/nlist of the data, the exact
  *    inverted-list behavior of the reference's IndexIVFPQ
  *    (/root/reference/multi_tenant_script.py:94-99) with Catalyst doing
  *    the pruning (no custom rule).
  *  - [[writeBucketed]]: persist bucketed-by-key tables so repeated
  *    co-keyed joins (fact-to-fact at scale) plan as zero-shuffle
  *    SortMergeJoins over pre-bucketed files.
  */
object Layout {

  /** Write the IVF-assigned base partitioned by cluster id. */
  def writeIvfPartitioned(assignedBase: DataFrame, path: String): Unit =
    assignedBase
      .repartition(col("cluster_id")) // one shuffle at build time, co-located files
      .write.mode("overwrite")
      .partitionBy("cluster_id")
      .parquet(path)

  /** Read it back; `filter(cluster_id isin ...)` prunes whole directories. */
  def readIvfPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Pruned scan for a probed cluster set — the file-level nprobe read. */
  def prunedClusters(spark: SparkSession, path: String, clusterIds: Seq[Int]): DataFrame =
    readIvfPartitioned(spark, path).filter(col("cluster_id").isin(clusterIds: _*))

  /** Persist the base with a materialized prefix column next to the full
    * vector — the storage layout for prefix-dim two-stage search
    * ([[graft.operators.Knn.prefixRerank]]): the cheap pass selects only
    * (vec_id, prefix) and Parquet column pruning makes it a physically
    * smaller read (visible as ReadSchema in the plan); only the rerank
    * touches the full embedding column. */
  def writePrefixLayout(base: DataFrame, prefixDim: Int, path: String): Unit =
    base.select(col("vec_id"),
        slice(col("embedding"), 1, prefixDim).as("prefix"),
        col("embedding"))
      .write.mode("overwrite").parquet(path)

  def readPrefixLayout(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a table bucketed by a join key (requires a saveAsTable
    * catalog; bucket count fixed at write time). Idempotent: drops the
    * catalog entry and any orphaned location first. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
