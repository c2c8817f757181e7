package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IvfIndex, LshIndex}
import graft.operators.{Knn, Recall, Snapshots}
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

  private def knnCosine(spark: SparkSession, dir: String): DataFrame =
    Knn.cosineTopK(
      Tables.embeddingQueries(spark, dir),
      Tables.embeddingBase(spark, dir),
      KnnK)

  /** IVF pruned kNN (SURVEY §2.2 I2 / §2.3). nlist=8/nprobe=6 clears the
    * BASELINE ≥0.9 recall bar on the weakly-clustered synthetic embeddings
    * (autotuned via graft.tools.IvfSweep, the MRPT-autotune analog); on
    * naturally clustered corpora the same code runs nlist=√n, nprobe≈10%. */
  private def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddingBase(spark, dir)
    val model = IvfIndex.fit(base, base, nlist = 8)
    IvfIndex.search(model, Tables.embeddingQueries(spark, dir), KnnK, nprobe = 6)
  }

  /** LSH kNN (SURVEY §2.2 I4/I5): 8 hash tables, L2 threshold 1.3. */
  private def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddingBase(spark, dir)
    val model = LshIndex.fit(base, numHashTables = 8, bucketLength = 0.5)
    LshIndex.search(model, Tables.embeddingQueries(spark, dir), base, KnnK, threshold = 1.3)
  }

  /** M1 recall with a full DuckDB oracle: predictions from a degraded base
    * (every 3rd vector dropped) scored against exact ground truth. */
  private def recallDegraded(spark: SparkSession, dir: String): DataFrame = {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    val degraded = base.filter(col("vec_id") % 3 =!= 0)
    Recall.recallAtK(Knn.exact(queries, degraded, KnnK), Knn.exact(queries, base, KnnK), KnnK)
  }

  /** IVF recall vs exact ground truth (no SQL oracle — KMeans; threshold
    * asserted in ScalaTest per BASELINE ladder: ≥ 0.9). */
  private def recallIvf(spark: SparkSession, dir: String): DataFrame = {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    Recall.recallAtK(knnIvf(spark, dir), Knn.exact(queries, base, KnnK), KnnK)
  }

  /** LSH recall vs exact ground truth (threshold ≥ 0.7 per BASELINE). */
  private def recallLsh(spark: SparkSession, dir: String): DataFrame = {
    val queries = Tables.embeddingQueries(spark, dir)
    val base = Tables.embeddingBase(spark, dir)
    Recall.recallAtK(knnLsh(spark, dir), Knn.exact(queries, base, KnnK), KnnK)
  }

  /** D1-D4 + the reference's delete∘insert=identity invariant (SURVEY §5):
    * delete 50% of the base (odd ids) via anti-join, re-insert via union,
    * search — results must hash-match the untouched-base oracle. */
  private def knnUpdateIdentity(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddingBase(spark, dir)
    val odd = base.filter(col("vec_id") % 2 === 1)
    val cycled = Snapshots.insert(Snapshots.deleteByIds(base, odd), odd)
    Knn.exact(Tables.embeddingQueries(spark, dir), cycled, KnnK)
  }

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
    "knn_cosine" -> ((s, dir) => knnCosine(s, dir)),
    "knn_ivf" -> ((s, dir) => knnIvf(s, dir)),
    "knn_lsh" -> ((s, dir) => knnLsh(s, dir)),
    "knn_update_identity" -> ((s, dir) => knnUpdateIdentity(s, dir)),
    "recall_degraded" -> ((s, dir) => recallDegraded(s, dir)),
    "recall_ivf" -> ((s, dir) => recallIvf(s, dir)),
    "recall_lsh" -> ((s, dir) => recallLsh(s, dir)),
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
  private val knnCosineOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
      |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
      |scored AS (
      |  SELECT q.query_id, b.vec_id AS neighbor_id,
      |         CAST(row_number() OVER (
      |           PARTITION BY q.query_id
      |           ORDER BY -list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), b.vec_id
      |         ) AS INTEGER) AS rank
      |  FROM q CROSS JOIN b)
      |SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 10""".stripMargin

  private val recallDegradedOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
      |b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
      |deg AS (SELECT * FROM b WHERE vec_id % 3 <> 0),
      |gt AS (SELECT query_id, neighbor_id FROM (
      |  SELECT q.query_id, b.vec_id AS neighbor_id,
      |         row_number() OVER (PARTITION BY q.query_id
      |           ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), b.vec_id) AS rank
      |  FROM q CROSS JOIN b) WHERE rank <= 10),
      |pr AS (SELECT query_id, neighbor_id FROM (
      |  SELECT q.query_id, deg.vec_id AS neighbor_id,
      |         row_number() OVER (PARTITION BY q.query_id
      |           ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(deg.embedding AS DOUBLE[])), deg.vec_id) AS rank
      |  FROM q CROSS JOIN deg) WHERE rank <= 10),
      |hits AS (SELECT gt.query_id, count(*) AS n FROM gt JOIN pr USING (query_id, neighbor_id) GROUP BY gt.query_id),
      |per_query AS (
      |  SELECT round(CAST(coalesce(hits.n, 0) AS DOUBLE) / 10, 4) AS recall
      |  FROM (SELECT DISTINCT query_id FROM gt) g LEFT JOIN hits USING (query_id))
      |SELECT round(avg(recall), 4) AS recall_at_k FROM per_query""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "knn_exact" -> knnOracle,
    "knn_exact_window" -> knnOracle,
    "knn_cosine" -> knnCosineOracle,
    "knn_update_identity" -> knnOracle,
    "recall_degraded" -> recallDegradedOracle,
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
