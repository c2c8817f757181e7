package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `randomSplit` re-rolls across retries and cluster re-runs; production
  * pipelines split by a **hash of the row id** instead, so a row's
  * assignment is a pure function of its identity — stable across runs,
  * machines, and engine versions. The Knuth multiplicative mix below is
  * exact 64-bit arithmetic, so the split is reproducible in any engine
  * (and DuckDB-oracle-checkable, unlike engine-specific hash functions).
  */
object Sampling {

  /** Bucket in [0, buckets) from the id — multiplicative hashing. */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(id * lit(2654435761L), lit(buckets.toLong))

  /** Deterministic train/test split: rows with bucket < trainPct go to
    * train. Returns the input with a `split` column ("train"/"test"). */
  def trainTestSplit(df: DataFrame, idCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(idBucket(col(idCol), 100) < trainPct, lit("train")).otherwise(lit("test")))

  /** Stratified cap: at most n rows per stratum, deterministic order. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
