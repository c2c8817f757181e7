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

  /** `events.parquet` stores ts as parquet TIMESTAMP(NANOS), which Spark
    * reads only as a nanos Long (spark.sql.legacy.parquet.nanosAsLong).
    * Normalize to a microsecond TimestampType here so downstream operators
    * see a standard timestamp whichever way the session is configured. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: `/` on Columns is floating-point and int64
        // nanos exceed double's 2^53 exact range (silent ±1µs corruption)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
