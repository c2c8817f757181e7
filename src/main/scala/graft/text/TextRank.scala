package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval: BM25 scoring and reciprocal-rank fusion — the text
  * half of hybrid (lexical + vector) search over the corpus.
  *
  * Shapes at scale: BM25 is two aggregations (term frequencies per doc,
  * document frequencies per term) + a broadcast of the per-term idf for
  * the query's terms only; fusion is a rank-window + groupBy on doc id.
  */
object TextRank {

  /** BM25 scores for one bag-of-words query. Standard Okapi parameters.
    * Output: (doc_id, score) for docs matching ≥1 term. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = docs.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("dl"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("term"),
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"))
    val avgdl = dl.select(avg(col("dl")).as("avgdl"))
    tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(avgdl))
      .withColumn("t_score",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("t_score")), 4).as("score"))
  }

  /** Top-k by BM25, deterministic ordering. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame =
    bm25(docs, queryTerms)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Reciprocal-rank fusion of any number of (doc_id, score)-ranked lists:
    * rrf(d) = Σ_lists 1/(c + rank_list(d)). Rank ties broken by doc_id, so
    * the fusion is exactly reproducible in SQL. The lists are doc-sized
    * (every matching document carries a rank), so each rank is a
    * range-partitioned parallel prefix count, never the
    * single-partition `row_number().over(orderBy)` window — and all
    * lists rank in ONE machine
    * ([[graft.operators.Eval.withGroupedRowNumber]] keyed on list id)
    * instead of paying the checkpoint + offsets-collect per list. */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60): DataFrame = {
    val union = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("doc_id"), col("score").cast("double").as("score"))
        .withColumn("list_id", lit(i))
    }.reduce(_ unionByName _)
    graft.operators.Eval.withGroupedRowNumber(
        union, "list_id", Seq(negate(col("score")), col("doc_id")), "rank")
      .groupBy(col("doc_id"))
      .agg(round(sum(lit(1.0) / (lit(c) + col("rank"))), 6).as("rrf_score"))
  }
}
