package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet fixture loaders (SURVEY §1.3, FIXTURES §2) plus the base/query
  * split convention for the vector tables.
  *
  * The reference loads SIFT1M as four dense matrices `(xt, xb, xq, gt)`
  * (`/root/reference/dynamic_script_faiss.py:17-22`); our analog is the
  * `embeddings` table split by `vec_id % 20`: 1-in-20 rows are queries,
  * the rest the indexed base. Ground truth is derived by exact kNN rather
  * than read from a file.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "embeddings")

  /** Query split: `vec_id % 20 == 0` (FIXTURES §2 convention). */
  def embeddingQueries(spark: SparkSession, sfDir: String): DataFrame =
    embeddings(spark, sfDir)
      .filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))

  /** Base split: everything that is not a query. */
  def embeddingBase(spark: SparkSession, sfDir: String): DataFrame =
    embeddings(spark, sfDir)
      .filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id"), col("embedding"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents")

  /** `events.parquet` fixtures have drifted across generations: parquet
    * TIMESTAMP(NANOS) (Spark reads a nanos Long under
    * spark.sql.legacy.parquet.nanosAsLong), unannotated timestamp[us]
    * (Spark reads TIMESTAMP_NTZ), or a proper tz-annotated timestamp.
    * Normalize every variant to a standard TimestampType so downstream
    * `unix_millis(ts)` / bigint casts analyze the same way regardless of
    * which fixture generation is on disk. The session timezone is pinned
    * to UTC in Bench/Verify/tests, so the NTZ→TZ cast is lossless. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventTs(table(spark, sfDir, "events"))

  /** The ts normalization applied to ANY events-shaped frame — shared by
    * the batch loader and the `readStream` sources (which cannot go
    * through [[events]]). */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` on Columns is floating-point and int64
        // nanos exceed double's 2^53 exact range (silent ±1µs corruption)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")

  def orders(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "orders")

  def customer(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "customer")

  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "supplier")

  def nation(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "nation")

  def region(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "region")

  def part(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "part")
}
