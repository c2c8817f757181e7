package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Late-interaction (ColBERT-style MaxSim) retrieval: query and document
  * are bags of PER-TOKEN vectors; the score is
  * `Σ_{q∈Q} max_{t∈D} ⟨v(q), v(t)⟩` — each query token finds its best
  * match in the document independently, which is what lets a multi-word
  * query match a document that scatters the words.
  *
  * Token vectors here are deterministic integer pseudo-embeddings: dim j
  * of a token is an affine re-mix of the token's PolyHash, centered to
  * [−1000, 1000]. That keeps every dot product, max, and sum in exact
  * int64 (engine-replayable) while exercising the REAL late-interaction
  * dataflow — swap [[tokenDims]] for learned vectors and nothing else
  * changes.
  *
  * Scale shape: scoring is (query tokens) × (distinct doc tokens) with
  * the query side broadcast — a map-side nested loop, no shuffle until
  * the per-(query, token, doc) max, whose key space is already
  * |Q|·|Q tokens|·|docs| (partial aggregation collapses it map-side).
  * At 100 TB the doc-token table is the thing you'd index (IVF/LSH per
  * token); the brute pass here is the recall-1.0 baseline.
  */
object LateInteraction {

  private val P = 1000000007L
  /** Per-dimension affine re-mix coefficients (4 dims). */
  val DimA = Seq(1103515245L, 1299709L, 15485863L, 32452843L)
  val DimB = Seq(12345L, 7919L, 104729L, 65537L)

  /** dim j of a token vector from its PolyHash: values in [−1000, 1000].
    * ph < 2^30 and A_j < 2^31 keep the multiply wrap-free in int64. */
  private def dim(ph: Column, j: Int): Column =
    pmod(pmod(ph * lit(DimA(j)) + lit(DimB(j)), lit(P)), lit(2001L)) - lit(1000L)

  private def withDims(df: DataFrame, prefix: String): DataFrame =
    DimA.indices.foldLeft(df)((d, j) => d.withColumn(s"$prefix$j", dim(col("ph"), j)))

  /** (doc_id, ph, v0..v3): one row per DISTINCT token per document. */
  def docTokenVectors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withDims(
      docs.select(col(idCol).as("doc_id"),
          explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .select(col("doc_id"), PolyHash.column(col("tok"), 257L, P).as("ph"))
        .distinct(), "v")

  /** (query_id, qpos, ph, q0..q3): the first `qLen` tokens of each query
    * document, position-numbered (duplicate tokens keep their slots —
    * MaxSim sums per query POSITION). */
  def queryTokenVectors(queries: DataFrame, idCol: String, textCol: String,
      qLen: Int): DataFrame =
    withDims(
      queries.select(col(idCol).as("query_id"),
          posexplode(slice(TextFunctions.tokens(col(textCol)), 1, qLen)))
        .select(col("query_id"), (col("pos") + 1).as("qpos"),
          PolyHash.column(col("col"), 257L, P).as("ph")), "q")

  /** Top-k documents per query by MaxSim. `queries` and `docs` share the
    * (idCol, textCol) schema; a query never matches its own document.
    *
    * The interaction runs inside the fused [[graft.functions
    * .MaxSimScore]] kernel over per-row token-vector bags: |Q|·|docs|
    * scored rows instead of |Q tokens|·|doc tokens| aggregate traffic
    * (26× fewer rows here, and the ratio grows with document length). */
  def maxSimTopK(queries: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, qLen: Int, k: Int): DataFrame = {
    val qBag = queryTokenVectors(queries, idCol, textCol, qLen)
      .groupBy(col("query_id"))
      .agg(collect_list(array(DimA.indices.map(j => col(s"q$j")): _*)).as("qvecs"))
    // ONE shuffle for the doc bags: collect_set dedupes (max over a bag
    // ignores duplicates, so set-of-vectors ≡ distinct-tokens-then-list)
    // with map-side partial sets, replacing the distinct + groupBy
    // two-shuffle chain
    val dBag = withDims(
      docs.select(col(idCol).as("doc_id"),
          explode(TextFunctions.tokens(col(textCol))).as("tok"))
        .select(col("doc_id"), PolyHash.column(col("tok"), 257L, P).as("ph")), "v")
      .groupBy(col("doc_id"))
      .agg(collect_set(array(DimA.indices.map(j => col(s"v$j")): _*)).as("dvecs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // collect_list order varies with partitioning, but MaxSim is a
    // max/sum over the bags — bag-order-free, so the score is exact.
    // spread the scan side (r12): the doc-bag aggregate coalesces to one
    // partition at fixture scale, so the |Q|·|docs| MaxSim kernel scan —
    // this operator's whole cost — otherwise runs single-task (the
    // Knn.spread rationale; one O(|docs|) reshuffle amortized against
    // the quadratic scan at any scale)
    graft.operators.Knn.spread(dBag).crossJoin(broadcast(qBag))
      .select(col("query_id"), col("doc_id"),
        graft.functions.GraftFunctions.maxSimScore(col("qvecs"), col("dvecs")).as("score"))
      .filter(col("query_id") =!= col("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        col("score"), col("rank"))
  }
}
