package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * value (the classic magic-mask sequence) — building block for the
    * Morton/Z-order curve. Pure Column arithmetic: codegen'd, no UDF. */
  private def spreadBits16(x: Column): Column = {
    def step(c: Column, shift: Int, mask: Long): Column =
      c.bitwiseOR(shiftleft(c, shift)).bitwiseAND(lit(mask))
    val m = step(step(step(step(x.bitwiseAND(lit(0xFFFFL)),
      8, 0x00FF00FFL), 4, 0x0F0F0F0FL), 2, 0x33333333L), 1, 0x55555555L)
    m
  }

  /** Morton z-value of two columns, each min-max normalized to 16 bits
    * with exact integer arithmetic (floor-div — engine-reproducible). */
  def zOrderValue(x: Column, y: Column,
      xMin: Long, xMax: Long, yMin: Long, yMax: Long): Column = {
    def norm(c: Column, lo: Long, hi: Long): Column =
      ((c.cast("long") - lit(lo)) * lit(65535L)) / lit(math.max(hi - lo, 1L)) cast "long"
    spreadBits16(norm(x, xMin, xMax))
      .bitwiseOR(shiftleft(spreadBits16(norm(y, yMin, yMax)), 1))
  }

  /** Z-order (multi-dimensional) clustering: sort the table along the
    * Morton curve of two range-queried columns and range-partition into
    * `numFiles` files. Each file then covers a small RECTANGLE in
    * (x, y) space, so the parquet footer min/max stats on BOTH natural
    * columns are tight — a 2-D range predicate skips most files/row
    * groups at scan time (the Delta/Iceberg Z-ORDER technique; single-
    * column sorting gives tight stats on one dimension only). One
    * build-time range shuffle; reads prune for free thereafter. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int = 32): Unit = {
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    df.withColumn("__zval",
        zOrderValue(col(xCol), col(yCol), r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .repartitionByRange(numFiles, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop("__zval")
      .write.mode("overwrite").parquet(path)
  }

  /** Hive-style date-partitioned layout: one directory per event date.
    * THE standard time-series layout at 100 TB — a date-range predicate
    * prunes whole directories at planning time (PartitionFilters in the
    * scan node), so a day query over a year of data lists 1/365th of
    * the files before reading a byte. Repartition by the partition
    * column first so each date writes one file, not one per task. */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events.withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("event_date"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Range-sorted file layout: range-partition + sort by `sortCol` so
    * every file covers a narrow, disjoint interval of the column —
    * the precondition for manifest-based file skipping (and for tight
    * parquet footer min/max). One build-time shuffle. */
  def writeSortedFiles(df: DataFrame, sortCol: String, path: String,
      numFiles: Int = 16): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)

  /** Iceberg/Delta-style file manifest: per data file, the min/max of
    * `statCol` and the row count — collected in ONE scan at build time
    * and kept as a metadata-sized table (one row per file; ~100k rows
    * even at 100 TB with 1 GB files). Planning a query then consults
    * the manifest instead of listing + footer-reading every file. */
  def buildManifest(spark: SparkSession, path: String, statCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("min_stat"),
        max(col(statCol)).as("max_stat"),
        count(lit(1)).as("n_rows"))

  /** Manifest-pruned scan: keep only files whose [min, max] interval
    * intersects [lo, hi], read exactly those, and re-apply the
    * predicate as the residual filter. The driver-side collect is the
    * surviving FILE LIST (metadata-sized), never data. Returns the
    * pruned DataFrame plus (filesRead, filesTotal) for observability. */
  def manifestPrunedScan(spark: SparkSession, manifest: DataFrame,
      statCol: String, lo: Column, hi: Column): (DataFrame, Int, Long) = {
    val total = manifest.count()
    val files = manifest
      .filter(col("max_stat") >= lo && col("min_stat") <= hi)
      .select(col("file")).collect().map(_.getString(0)).sorted
    val df =
      if (files.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col(statCol) >= lo && col(statCol) <= hi)
    (df, files.length, total)
  }

  /** Small-file compaction — the table-maintenance operation every
    * long-lived 100 TB table needs: streaming ingest and per-partition
    * writes leave thousands of KB-sized files whose open/footer/seek
    * overhead dominates scan time (and whose count bloats driver-side
    * listing). Bin-pack the input into ceil(totalBytes/targetBytes)
    * files with one shuffle-free-ish rewrite (coalesce avoids a full
    * shuffle; row order within files is irrelevant to a columnar scan).
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    val total = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(_.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Persist a table bucketed by a join key (requires a saveAsTable
    * catalog; bucket count fixed at write time). Idempotent: drops the
    * catalog entry and any prior files at the location first.
    *
    * `location` (when given) makes the table EXTERNAL at that path.
    * Callers that embed a per-JVM nonce in (table, location) get full
    * cross-process isolation: two concurrent JVMs sharing one
    * `spark-warehouse/` otherwise race on the same managed directory —
    * one JVM's drop-and-rewrite yanks files out from under the other's
    * already-planned scan (observed as FILE_NOT_EXIST mid-suite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, location: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(
      location.getOrElse(new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase).toString))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
    location.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
