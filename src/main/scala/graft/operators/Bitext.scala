package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.topKByDist
import graft.functions.VectorFunctions.cosine

/** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings") — the
  * alignment-mining pass of LASER/CCMatrix-class pipelines: given two
  * embedding sets (source-language and target-language sentences), find
  * pairs that are MUTUAL margin-best matches. Raw cosine similarity
  * over-fires on "hub" vectors that are close to everything; the ratio
  * margin normalizes each candidate score by the mean similarity of both
  * endpoints' k-nearest neighborhoods, so only pairs that stand OUT of
  * their local neighborhoods survive:
  *
  *   margin(x, y) = cos(x, y) / ((avgTopK(x) + avgTopK(y)) / 2)
  *
  * Engine-portable determinism: each pairwise cosine is the bit-exact
  * codegen kernel quantized ONCE to integer nano-units
  * (floor(cos·10⁹) — the same floor-quantization contract as
  * [[Knn.mmrTopK]]'s basis points), so every downstream sum, margin and
  * argmax is exact int64 arithmetic with ties broken by id — the whole
  * mining decision replays in a SQL oracle. The margin itself is emitted
  * in parts-per-million via integer division; all quantities are
  * non-negative by construction of the filters, so `div` (Spark) and
  * `//` (DuckDB) agree.
  *
  * Scale shape: pass 1 is the standard broadcast-queries scan + bounded
  * heap (k rows out per query per partition — [[Knn.exact]]'s plan);
  * pass 2 re-scores ONLY the selected pairs by joining ids back to the
  * two embedding tables (O(k·n) rows, row-local kernel, no all-pairs
  * materialization); everything after is joins and windows over
  * neighborhoods of ≤ 2k rows per node. At 100 TB the exact top-k pass
  * is replaced by any ANN candidate generator (IVF/LSH/graph — same
  * output schema) and passes 2+ are unchanged.
  */
object Bitext {

  /** Quantized cosine in nano-units: floor(cos · 10⁹) as int64. The
    * double product is exact for |cos| ≤ 1 and the floor of a
    * deterministic double is deterministic, so both engines agree
    * bit-for-bit. */
  private def cosQ(a: Column, b: Column): Column =
    floor(cosine(a, b) * lit(1000000000.0d)).cast("long")

  /** Mutual margin-best pairs between `src` and `tgt` (both
    * `(vec_id: Long, embedding: Array[Float])`).
    * Output: `(src_id, tgt_id, cos_q, margin_ppm)` — one row per pair
    * that is simultaneously its source's best margin candidate and its
    * target's best margin candidate, with positive quantized cosine and
    * positive neighborhood mass. */
  def mutualMarginPairs(src: DataFrame, tgt: DataFrame, k: Int = 4): DataFrame = {
    val srcQ = src.select(col("vec_id").as("src_id"), col("embedding").as("s_emb"))
    val tgtQ = tgt.select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"))

    val topA = topIds(tgtQ, srcQ, "tgt_id", "src_id", "t_emb", "s_emb", k)
    val topB = topIds(srcQ, tgtQ, "src_id", "tgt_id", "s_emb", "t_emb", k)

    // each side is consumed twice (neighborhood sum + candidate set), so
    // the top-k pass recomputes per consumer (the broadcast build sides
    // DO reuse). Deliberately NOT checkpointed: the recompute is cheaper
    // than the materialization barrier at fixture scale (A/B at sf0.1:
    // 1.82 s plain vs 2.52 s checkpointed warm). A caller swapping in an
    // EXPENSIVE candidate generator should persist at its own call site.
    val scoredA = rescored(srcQ, tgtQ, topA)
    val scoredB = rescored(srcQ, tgtQ, topB)
    mineFromNeighborhoods(scoredA, scoredB, k)
  }

  /** [[mutualMarginPairs]] with the candidate pass on a `prefixDim`-dim
    * embedding PREFIX — the concrete scale path the exact variant's
    * all-pairs pass cannot take (same move as
    * [[Knn.prefixRerank]]/Matryoshka): the cheap pass scores
    * prefixDim/dim of the bytes (physically smaller with a stored-prefix
    * layout), keeps a per-node `shortlist`, and only shortlisted pairs
    * are scored full-dim; each node's neighborhood is then its top-k BY
    * FULL cosine within the shortlist, and the margin machinery is
    * IDENTICAL from there. How much of the exact mining this recovers is
    * a measured query (`bitext_prefix_recovery`), not a guess. */
  def mutualMarginPairsPrefix(src: DataFrame, tgt: DataFrame, k: Int = 4,
      prefixDim: Int = 32, shortlist: Int = 16): DataFrame = {
    val srcQ = src.select(col("vec_id").as("src_id"), col("embedding").as("s_emb"))
    val tgtQ = tgt.select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"))
    val srcP = srcQ.select(col("src_id"), slice(col("s_emb"), 1, prefixDim).as("s_emb"))
    val tgtP = tgtQ.select(col("tgt_id"), slice(col("t_emb"), 1, prefixDim).as("t_emb"))

    val shortA = topIds(tgtP, srcP, "tgt_id", "src_id", "t_emb", "s_emb", shortlist)
    val shortB = topIds(srcP, tgtP, "src_id", "tgt_id", "s_emb", "t_emb", shortlist)
    mutualMarginPairsFromCandidates(src, tgt, shortA, shortB, k)
  }

  /** The pluggable pass-1 contract made explicit: margin mining over
    * ARBITRARY candidate pair sets `candA` (per-src candidates) and
    * `candB` (per-tgt candidates), both `(src_id, tgt_id[, ...])`. Each
    * node's neighborhood is its top-`k` BY FULL cosine within its
    * candidates (full-dim rescore = two id joins + the codegen kernel,
    * row-local), and the margin machinery is identical from there — the
    * swap point the class scaladoc promises ("the exact top-k pass is
    * replaced by any ANN candidate generator"). The prefix variant
    * routes through here; the IVF-candidate variant (`bitext_margin_ann`)
    * is the measured 100 TB pass 1 the r9 recovery curve called for. */
  def mutualMarginPairsFromCandidates(src: DataFrame, tgt: DataFrame,
      candA: DataFrame, candB: DataFrame, k: Int = 4): DataFrame = {
    val srcQ = src.select(col("vec_id").as("src_id"), col("embedding").as("s_emb"))
    val tgtQ = tgt.select(col("vec_id").as("tgt_id"), col("embedding").as("t_emb"))
    // full-dim rescore of the candidates, then per-node top-k by full
    // cosine — a window over the per-node candidate set
    def topOfCandidates(pairs: DataFrame, nodeCol: String, otherCol: String): DataFrame = {
      val w = Window.partitionBy(col(nodeCol))
        .orderBy(col("cos_q").desc, col(otherCol).asc)
      rescored(srcQ, tgtQ, pairs.select(col("src_id"), col("tgt_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("src_id"), col("tgt_id"), col("cos_q"))
    }
    mineFromNeighborhoods(
      topOfCandidates(candA, "src_id", "tgt_id"),
      topOfCandidates(candB, "tgt_id", "src_id"), k)
  }

  /** Top-`m` neighbor IDS per node of `bcastSide` via the bounded-heap
    * aggregate over a broadcast-queries scan (dist = -cos_q; int64 →
    * double is exact below 2^53, so heap order == (cos_q desc, id
    * asc)). */
  private def topIds(scanSide: DataFrame, bcastSide: DataFrame, scanId: String,
      bcastId: String, scanEmb: String, bcastEmb: String, m: Int): DataFrame =
    // spread the scan side (r12): the fixture embeddings parquet is one
    // split, so the O(|scan|·|bcast|) cosine pass otherwise runs in a
    // single task (the Knn.spread rationale; heap output is order-free)
    graft.operators.Knn.spread(scanSide).crossJoin(broadcast(bcastSide))
      .select(col(bcastId), col(scanId),
        cosQ(col(bcastEmb), col(scanEmb)).as("cq"))
      .groupBy(col(bcastId))
      .agg(topKByDist(col(scanId), -col("cq").cast("double"), m).as("nn"))
      .select(col(bcastId), explode(col("nn")).as(scanId))

  /** Full-dim re-score of selected (src_id, tgt_id) pairs — row-local
    * kernel after two id equi-joins, no all-pairs rejoin. */
  private def rescored(srcQ: DataFrame, tgtQ: DataFrame, pairs: DataFrame): DataFrame =
    pairs.join(srcQ, "src_id").join(tgtQ, "tgt_id")
      .select(col("src_id"), col("tgt_id"), cosQ(col("s_emb"), col("t_emb")).as("cos_q"))

  /** The margin decision, shared by every candidate generator:
    * neighborhood sums → ratio margin in ppm → mutual argmax. */
  private def mineFromNeighborhoods(scoredA: DataFrame, scoredB: DataFrame,
      k: Int): DataFrame = {
    val sumA = scoredA.groupBy(col("src_id")).agg(sum(col("cos_q")).as("sum_a"))
    val sumB = scoredB.groupBy(col("tgt_id")).agg(sum(col("cos_q")).as("sum_b"))

    // candidates = union of both sides' neighborhoods, deduped by pair
    // key (cos_q is identical on both arms, so first() is exact)
    val cand = scoredA.union(scoredB)
      .groupBy(col("src_id"), col("tgt_id")).agg(first(col("cos_q")).as("cos_q"))

    // margin in ppm: 10⁶ · cos / ((sumA/k + sumB/k)/2) = 2k·10⁶·cos_q /
    // (sum_a + sum_b); positivity filters keep `div` truncation ==
    // floor division, so both engines agree
    val margins = cand
      .join(sumA, "src_id").join(sumB, "tgt_id")
      .filter(col("cos_q") > 0 && (col("sum_a") + col("sum_b")) > 0)
      .withColumn("margin_ppm",
        expr(s"(${2L * k} * 1000000 * cos_q) div (sum_a + sum_b)"))
      .select(col("src_id"), col("tgt_id"), col("cos_q"), col("margin_ppm"))

    // mutual best: argmax margin per src AND per tgt (ties to smaller id);
    // windows span ≤ 2k candidate rows per node — bounded by construction
    val wSrc = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_ppm").desc, col("tgt_id").asc)
    val wTgt = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_ppm").desc, col("src_id").asc)
    margins
      .withColumn("rs", row_number().over(wSrc))
      .withColumn("rt", row_number().over(wTgt))
      .filter(col("rs") === 1 && col("rt") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos_q"), col("margin_ppm"))
  }
}
