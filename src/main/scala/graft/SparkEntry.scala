package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY §2 (or the extended
  * LLM-pipeline surface); entries with deterministic, SQL-expressible
  * semantics also appear in `oracleSql` for the DuckDB hash-match.
  */
object SparkEntry {

  val KnnK = 10

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact brute-force kNN over the embeddings split — the reference's one
    * query shape (SURVEY §2.3). */
  def entry(spark: SparkSession): DataFrame =
    knnExact(spark, "/root/testdata/sf0.001")

  private def knnExact(spark: SparkSession, dir: String): DataFrame =
    Knn.exact(
      Tables.embeddingQueries(spark, dir),
      Tables.embeddingBase(spark, dir),
      KnnK)

  private def knnExactWindow(spark: SparkSession, dir: String): DataFrame =
    Knn.exactWindow(
      Tables.embeddingQueries(spark, dir),
      Tables.embeddingBase(spark, dir),
      KnnK)

  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_exact" -> ((s, dir) => knnExact(s, dir)),
    "knn_exact_window" -> ((s, dir) => knnExactWindow(s, dir)),
    "q1_agg" -> ((s, dir) => q1Agg(s, dir)),
  )

  // DuckDB oracle SQL. Table names resolve to the same parquet fixtures.
  // Column names and types must match the Spark results exactly (driver
  // sorts columns by name before hashing).
  private val knnOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
      |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
      |scored AS (
      |  SELECT q.query_id, b.vec_id AS neighbor_id,
      |         CAST(row_number() OVER (
      |           PARTITION BY q.query_id
      |           ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), b.vec_id
      |         ) AS INTEGER) AS rank
      |  FROM q CROSS JOIN b)
      |SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 10""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_exact" -> knnOracle,
    "knn_exact_window" -> knnOracle,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
