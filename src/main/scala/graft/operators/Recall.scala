package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `compute_recall` (SURVEY §2.5 M1) — the reference's flagship metric:
  * |pred[:k] ∩ gt[:k]| summed over queries ÷ (n_queries · k)
  * (`/root/reference/dynamic_script_faiss.py:25-29`).
  *
  * Inputs are rank-result tables as produced by [[Knn]]:
  * (query_id, neighbor_id, rank). The whole metric is one join + one
  * aggregation — no driver-side loops, scales to any number of queries.
  */
object Recall {

  /** Per-query overlap fraction: (query_id, recall). */
  def perQuery(pred: DataFrame, gt: DataFrame, k: Int): DataFrame = {
    val p = pred.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    val g = gt.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    // inner join on (query_id, neighbor_id) counts the intersection;
    // right-side queries with zero hits are restored via the gt key set.
    val hits = p.join(g, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"))
    g.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(
        col("query_id"),
        round(coalesce(col("n_hits"), lit(0)).cast("double") / k, 4).as("recall"))
  }

  /** Scalar recall@k over all queries — the reference's single number. */
  def recallAtK(pred: DataFrame, gt: DataFrame, k: Int): DataFrame =
    perQuery(pred, gt, k)
      .agg(round(avg(col("recall")), 4).as("recall_at_k"))

  /** Recall in basis points — pure integer arithmetic (total hits ×10⁴
    * div total gt rows), bit-exact in any engine; the oracle-safe form. */
  def recallBasisPoints(pred: DataFrame, gt: DataFrame, k: Int): DataFrame = {
    val p = pred.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    val g = gt.filter(col("rank") <= k).select(col("query_id"), col("neighbor_id"))
    val hits = p.join(g, Seq("query_id", "neighbor_id")).agg(count(lit(1)).as("n_hits"))
    val total = g.agg(count(lit(1)).as("n_gt"))
    hits.crossJoin(total)
      .select(expr("(n_hits * 10000L) div n_gt").as("recall_bp"))
  }
}
