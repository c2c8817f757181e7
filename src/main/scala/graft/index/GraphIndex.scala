package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.topKByDist
import graft.functions.VectorFunctions.l2sq

/** Graph-based ANN — the Spark-native answer to the reference's HNSW-class
  * backends (SURVEY §2.2 I1 FAISS `IndexHNSWFlat`,
  * `/root/reference/dynamic_script_faiss.py:53-57`; I3 hnswlib,
  * `/root/reference/dynamic_script_hnswlib.py:46-51`; I6 NGT,
  * `/root/reference/dynamic_script_ngt.py:57-65`).
  *
  * An HNSW walk is inherently sequential — a greedy beam through a pointer
  * structure — which distributes poorly. The batch re-expression keeps the
  * two ideas that carry the recall: (1) a precomputed NEIGHBORHOOD GRAPH
  * encodes most of the metric structure, and (2) search = cheap ENTRY
  * POINTS + graph EXPANSION + exact rerank. The sequential beam becomes one
  * bounded breadth-first expansion, so every stage is a hash join:
  *
  *   - build: the degree-`d` k-NN graph of the base. Here exact via the
  *     bounded-heap brute-force pass (fixture scale); at 100 TB the same
  *     adjacency schema is built approximately per IVF cell (equi-join
  *     within cell — candidates are co-partitioned) or by NN-Descent
  *     rounds, both plain joins.
  *   - search: score queries against a deterministic entry-point subsample
  *     (`vec_id % seedMod == 0` — the coarse "upper layer"; its size is
  *     |base|/seedMod, so seedMod tunes the brute-force fraction), keep
  *     `seedK` seeds per query, expand `hops` rounds through the adjacency
  *     (hash join on node id, fan-out ≤ degree per candidate), dedupe, and
  *     exact-rerank the candidate set with the bounded-heap aggregate.
  *
  * Shuffle shape at scale: the seed pass is a broadcast-queries scan over
  * 1/seedMod of the base; each hop is a hash join keyed on node id against
  * an adjacency that is |base|·degree rows (partitioned by node id, so
  * expansion co-locates); the rerank touches |queries|·|candidates| rows.
  * No stage depends on |base|² after the one-time build.
  *
  * Everything is deterministic (ties broken by id), so adjacency, seeding,
  * expansion, and rerank all replay in the DuckDB oracle.
  */
object GraphIndex {

  /** Exact degree-`degree` k-NN graph over the base:
    * `(node_id, neighbor_id, rank)` with rank ∈ [1, degree] ordered by
    * (squared L2, neighbor_id), self excluded. Computed as top-(degree+1)
    * through [[graft.operators.Knn.exact]] then dropping the self match —
    * at most one self row can appear, so the surviving top-`degree` rows
    * and their order are exactly the top-`degree` among non-self rows. */
  def buildExact(base: DataFrame, degree: Int): DataFrame = {
    val asQueries = base.select(
      col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    graft.operators.Knn.exact(asQueries, base, degree + 1)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("g_rank", row_number().over(w))
      .filter(col("g_rank") <= degree)
      .select(col("query_id").as("node_id"), col("neighbor_id"),
        col("g_rank").cast("int").as("rank"))
  }

  /** Entry-point seeding + `hops`-round expansion + exact rerank.
    * Output: `(query_id, neighbor_id, rank)`, rank ∈ [1, k]. */
  def search(queries: DataFrame, base: DataFrame, adjacency: DataFrame,
      k: Int, seedMod: Int = 16, seedK: Int = 8, hops: Int = 1): DataFrame = {
    val entry = base.filter(col("vec_id") % seedMod === 0)
    val seeds = graft.operators.Knn.exact(queries, entry, seedK)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val adj = adjacency.select(col("node_id"), col("neighbor_id"))
    var cand = seeds
    for (_ <- 1 to hops) {
      val expanded = cand.join(adj, cand("vec_id") === adj("node_id"))
        .select(cand("query_id"), adj("neighbor_id").as("vec_id"))
      cand = cand.union(expanded).distinct()
    }
    val topk = topKByDist(col("vec_id"), col("dist"), k)
    cand.join(base, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id"),
        l2sq(col("q_embedding"), col("embedding")).as("dist"))
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
