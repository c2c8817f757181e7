package graft.index

import org.apache.spark.sql.{Column, DataFrame}
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

  /** NN-Descent approximate k-NN graph build (Dong et al., WWW 2011) —
    * the 100 TB scale path for [[buildExact]], whose all-pairs pass is
    * O(n²) and stops being writable long before that. NN-Descent's
    * premise: "a neighbor of a neighbor is likely a neighbor". Start from
    * a cheap blocked graph, then iterate: each node scores its neighbors'
    * neighbors and keeps the best `degree`. Cost per round is
    * O(n · degree²) — linear in n — and every step is a hash join on node
    * id, so the rounds are shuffles on the same key, not nested loops.
    *
    *   - init: `degree` PER-EDGE pseudo-random neighbors per node —
    *     neighbor j of the node at dense rank r is the node at rank
    *     mix32(r·31 + j) mod n (Knuth multiplicative mix, wrap-safe
    *     split-multiply like [[graft.operators.Sampling.idBucket]]).
    *     Per-edge randomness is load-bearing: any class-based init
    *     (same-block, residue classes) is algebraically CLOSED under
    *     neighbor-of-neighbor expansion — candidates never leave the
    *     class and the descent stalls at the class-local optimum
    *     (measured: 6-23% edge recall, flat across rounds, vs 95%+
    *     with scattered init on the same fixtures). The dense rank is
    *     a global row_number over ids only (a narrow metadata-scale
    *     column; at 100 TB use per-partition offsets / zipWithIndex
    *     or the ids themselves when they're dense).
    *   - round: candidates = undirected 1-hop ∪ undirected 2-hop
    *     (neighbors and reverse neighbors, then one join through the
    *     edge list), dedup, exact-score, keep top-`degree` per node via
    *     the bounded-heap aggregate. `localCheckpoint` between rounds
    *     truncates the iterative lineage.
    *
    * Deterministic throughout (ties by id), so the whole build — init,
    * both expansion rounds, final ranks — replays in the DuckDB oracle.
    * Output: `(node_id, neighbor_id, rank)` like [[buildExact]], directly
    * usable by [[search]]. */
  /** Exact-score edge candidates `(node_id, neighbor_id)` against
    * `base`'s embeddings and keep the best `degree` per node (bounded
    * heap, ties by id). Duplicate candidate edges are absorbed by the
    * heap's (dist, id) semantics. */
  private def rankTop(base: DataFrame, cand: DataFrame, degree: Int): DataFrame = {
    val topk = topKByDist(col("neighbor_id"), col("dist"), degree)
    val nodeEmb = base.select(col("vec_id").as("node_id"), col("embedding").as("n_emb"))
    val nbrEmb = base.select(col("vec_id").as("neighbor_id"), col("embedding").as("b_emb"))
    cand.join(nbrEmb, "neighbor_id").join(nodeEmb, "node_id")
      .select(col("node_id"), col("neighbor_id"),
        l2sq(col("n_emb"), col("b_emb")).as("dist"))
      .groupBy(col("node_id")).agg(topk.as("nn"))
      .select(col("node_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("node_id"), col("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  def buildNNDescent(base: DataFrame, degree: Int, rounds: Int = 3): DataFrame = {
    // (v · 2654435761) mod 2³², multiply split into 16-bit halves so no
    // intermediate overflows int64 under ANSI (same scheme as
    // Sampling.idBucket); v ≥ 0 here.
    def mix32(v: Column): Column = {
      val a = pmod(v, lit(4294967296L))
      pmod(pmod(shiftright(a, 16) * lit(2654435761L), lit(65536L)) * lit(65536L)
        + a.bitwiseAND(lit(65535L)) * lit(2654435761L), lit(4294967296L))
    }
    val nTotal = base.count()
    val ranked = base.select(col("vec_id"),
      (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("long").as("rn"))
    val initEdges = ranked
      .select(col("rn").as("a_rn"), explode(sequence(lit(1), lit(degree))).as("j"))
      .select(col("a_rn"),
        pmod(mix32(col("a_rn") * 31 + col("j")), lit(nTotal)).as("b_rn"))
      .filter(col("a_rn") =!= col("b_rn")).distinct()
    val init = initEdges
      .join(ranked.select(col("rn").as("a_rn"), col("vec_id").as("node_id")), "a_rn")
      .join(ranked.select(col("rn").as("b_rn"), col("vec_id").as("neighbor_id")), "b_rn")
      .select(col("node_id"), col("neighbor_id"))
    (1 to rounds).foldLeft(init.localCheckpoint()) { (adj, _) =>
      val e = adj.select(col("node_id"), col("neighbor_id"))
      val und = e.union(
        e.select(col("neighbor_id").as("node_id"), col("node_id").as("neighbor_id")))
        .distinct()
      val twoHop = und.as("u1")
        .join(und.as("u2"), col("u1.neighbor_id") === col("u2.node_id"))
        .select(col("u1.node_id").as("node_id"), col("u2.neighbor_id").as("neighbor_id"))
      val cand = und.union(twoHop)
        .filter(col("node_id") =!= col("neighbor_id"))
        .distinct()
      rankTop(base, cand, degree).localCheckpoint()
    }
  }

  /** HNSW-style incremental insert — D1 without a rebuild. The reference's
    * embedded backends cannot do this: FAISS/hnswlib/Annoy/MRPT/NGT all
    * rebuild the index on updates (SURVEY §2.4 D3;
    * `/root/reference/dynamic_script_faiss.py:92-97`), which is exactly
    * the QPS collapse BASELINE records during the 50%-update phase. Here:
    *
    *   1. each new node beam-searches the EXISTING graph ([[search]]) and
    *      takes the best `degree` of its visited set as out-edges — the
    *      standard HNSW insertion;
    *   2. the reverse edges are added (new nodes must be REACHABLE, not
    *      just connected: without them a search can only surface a new
    *      node if it happens to be an entry seed);
    *   3. every touched node re-prunes to the best `degree` by exact
    *      distance over the union of old and new edges.
    *
    * All three steps are hash joins + the bounded-heap aggregate; the
    * whole update touches O(|new|·degree) adjacency rows, not the graph.
    * Output: the augmented `(node_id, neighbor_id, rank)` adjacency over
    * `preBase ∪ newNodes`, directly usable by [[search]]. */
  def insert(preBase: DataFrame, adjacency: DataFrame, newNodes: DataFrame,
      degree: Int, seedMod: Int = 16, seedK: Int = 8, hops: Int = 3,
      beam: Int = 32): DataFrame = {
    val asQueries = newNodes.select(
      col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    // checkpointed: the new-edge plan embeds a full beam search; without
    // truncation every downstream search over the augmented adjacency
    // re-analyzes (and re-plans) that subtree ~3^hops times
    val newEdges = search(asQueries, preBase, adjacency, degree,
        seedMod, seedK, hops, beam)
      .select(col("query_id").as("node_id"), col("neighbor_id"))
      .localCheckpoint()
    val fullBase = preBase.union(newNodes.select(col("vec_id"), col("embedding")))
    val allEdges = adjacency.select(col("node_id"), col("neighbor_id"))
      .union(newEdges)
      .union(newEdges.select(col("neighbor_id").as("node_id"),
        col("node_id").as("neighbor_id")))
    // deliberately NOT checkpointed: both inputs are already checkpoint-
    // shallow (the build's per-round adjacency, the newEdges above), so a
    // consumer re-reading the augmented adjacency recomputes rankTop —
    // one keyed shuffle of the edge list + the bounded-heap aggregate per
    // re-read, NOT free (a beam search re-reads it per hop). The A/B
    // still favors recompute over materializing the full augmented edge
    // list: same-JVM with-vs-without measured 24.9 s vs 27.1 s cold for
    // the whole upsert+search at sf0.1, and 49.8 s vs 86.1 s at the 10×
    // probe — the materialization is the term that grows with the
    // corpus. A future consumer that re-reads the adjacency MANY more
    // times than a 3-hop search should checkpoint at its own call site.
    rankTop(fullBase, allEdges, degree)
  }

  /** Batched beam search: entry-point seeding, then `hops` rounds of
    * expand-score-prune, exact rerank over everything visited.
    *
    * The HNSW greedy walk, re-expressed so every round is a hash join
    * over the WHOLE query batch: the per-query beam (`beam` best
    * candidates so far) expands through the adjacency (join on node id,
    * fan-out ≤ degree), the expansion is exactly scored, and the beam is
    * re-pruned with the bounded-heap aggregate. All visited candidates
    * feed the final top-k (HNSW's visited-set semantics). Per-query work
    * is O(seedK·|base|/seedMod + hops·beam·degree) — independent of
    * |base| once seeded, which is what makes the graph index the
    * 100 TB path. With (seedK=8, beam=32, hops=3) on the fixtures this
    * clears the BASELINE graph ladder (recall@10 ≈ 0.98).
    * Output: `(query_id, neighbor_id, rank)`, rank ∈ [1, k]. */
  /** Cell-blocked approximate build — the 100 TB build path the exact
    * all-pairs pass cannot take: candidate pairs come from coarse-cell
    * CO-MEMBERSHIP (each node is assigned to its `nassign` nearest IVF
    * cells — multi-assignment captures border edges a single-cell
    * blocking would miss), so pair generation is a co-partitioned
    * equi-join on cell id, |cell|² per cell instead of |base|². The
    * bounded heap ranks each node's candidates; a pair sharing both
    * cells is absorbed by the heap's (dist, id) dedup. Edge recall vs
    * the exact graph is a measured query (`graph_cellblocked_quality`),
    * not a guess. */
  def buildCellBlocked(base: DataFrame, centroids: Array[Array[Long]],
      degree: Int, nassign: Int = 2): DataFrame = {
    val qq = base.select(col("vec_id"), IvfFlat.quantize(col("embedding")).as("qv"))
    val cells = IvfFlat.probeCells(qq, centroids, nassign)
      .select(col("query_id").as("vec_id"), col("cid"))
    val nodes = cells.join(base, Seq("vec_id")).localCheckpoint()
    val pairs = nodes.alias("na")
      .join(nodes.alias("nb"), col("na.cid") === col("nb.cid"))
      .filter(col("na.vec_id") =!= col("nb.vec_id"))
      .select(col("na.vec_id").as("node_id"),
        col("nb.vec_id").as("cand_id"),
        l2sq(col("na.embedding"), col("nb.embedding")).as("dist"))
    pairs.groupBy(col("node_id"))
      .agg(topKByDist(col("cand_id"), col("dist"), degree).as("nn"))
      .select(col("node_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("node_id"), col("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  def search(queries: DataFrame, base: DataFrame, adjacency: DataFrame,
      k: Int, seedMod: Int = 16, seedK: Int = 8, hops: Int = 3,
      beam: Int = 32): DataFrame =
    searchImpl(queries, base, adjacency, None, k, seedMod, seedK, hops, beam)

  /** [[search]] ranked by COSINE similarity (descending, ties by id) —
    * the default serving metric of the HNSW-class backends the reference
    * wraps (Redis FT.CREATE and Milvus both expose COSINE alongside L2;
    * Weaviate defaults to it). Same batched beam, same bounded heap; the
    * score column is −cos so the ascending heap/rank machinery is reused
    * unchanged. Pair with a cosine-built adjacency for end-to-end cosine
    * serving. */
  def searchCosine(queries: DataFrame, base: DataFrame, adjacency: DataFrame,
      k: Int, seedMod: Int = 16, seedK: Int = 8, hops: Int = 3,
      beam: Int = 32): DataFrame =
    searchImpl(queries, base, adjacency, None, k, seedMod, seedK, hops, beam,
      cosine = true)

  /** FILTERED graph search — the predicate-composable serving mode of
    * the HNSW-class backends (Milvus/Weaviate expose exactly this on
    * their HNSW collections). The beam TRAVERSES the full graph —
    * pruning disallowed nodes from expansion would disconnect it under
    * selective predicates (the ACORN observation, Patel et al.
    * SIGMOD'24) — and only the final rerank restricts to the allowed id
    * set, so recall degrades with selectivity instead of collapsing.
    * `allowed` is one id column (`vec_id`); the restriction is a
    * left-semi hash join on the visited set, never a scan-side filter
    * of the adjacency. */
  def searchFiltered(queries: DataFrame, base: DataFrame, adjacency: DataFrame,
      allowed: DataFrame, k: Int, seedMod: Int = 16, seedK: Int = 8,
      hops: Int = 3, beam: Int = 32): DataFrame =
    searchImpl(queries, base, adjacency, Some(allowed), k, seedMod, seedK, hops, beam)

  private def searchImpl(queries: DataFrame, base: DataFrame, adjacency: DataFrame,
      allowed: Option[DataFrame], k: Int, seedMod: Int, seedK: Int, hops: Int,
      beam: Int, cosine: Boolean = false): DataFrame = {
    val entry = base.filter(col("vec_id") % seedMod === 0)
    val seeds = (if (cosine)
      graft.operators.Knn.cosineTopK(queries, entry, seedK)
    else graft.operators.Knn.exact(queries, entry, seedK))
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val adj = adjacency.select(col("node_id"), col("neighbor_id"))
    def score(cand: DataFrame): DataFrame =
      cand.join(base, "vec_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("vec_id"),
          (if (cosine)
            -graft.functions.VectorFunctions.cosine(col("q_embedding"), col("embedding"))
          else l2sq(col("q_embedding"), col("embedding"))).as("dist"))
    def topOf(scored: DataFrame, m: Int): DataFrame =
      scored.groupBy(col("query_id"))
        .agg(topKByDist(col("vec_id"), col("dist"), m).as("nn"))
        .select(col("query_id"), explode(col("nn")).as("vec_id"))
    // No distinct() anywhere: the bounded-heap aggregate de-duplicates by
    // (dist, id), so duplicate candidates from multi-path expansion are
    // absorbed where the data is already being shuffled anyway — three
    // fewer exchanges per query than an explicit dedup pass.
    //
    // localCheckpoint per hop is load-bearing for PLAN size, not data:
    // each hop references the previous beam's subplan ~3× (expand, the
    // union, the visited accumulator), so an unchecked fold builds a
    // 3^hops-node logical plan — at hops=3 over an adjacency that is
    // itself a query (e.g. insert-into-NND), analysis alone costs
    // seconds per action. The checkpoint truncates each hop to a
    // LogicalRDD leaf of ≤ beam·|queries| rows. LAZY (eager=false, r12):
    // the plan is truncated either way, but materialization folds into
    // the next hop's job instead of paying a scheduling round per hop —
    // and the FINAL hop's beam (discarded by the fold; only `visited`
    // survives) is never materialized at all, saving one aggregate job
    // per search.
    //
    // The beam side of the expansion join carries an explicit broadcast
    // (r12): both beam and adjacency are LogicalRDD leaves with no size
    // stats, so the planner fell back to a SortMergeJoin that EXCHANGED
    // BOTH SIDES every hop — 2 shuffles + sorts per hop of which the
    // adjacency side is |base|·degree rows at scale. The beam is
    // O(|queries|·beam) — the query side, small by the same contract that
    // broadcasts `queries` in score() — so broadcasting it turns each hop
    // into a shuffle-free hash probe of the adjacency (guide §3.1).
    val (_, visited) = (1 to hops).foldLeft((seeds.localCheckpoint(false), seeds)) {
      case ((beamDf, vis), _) =>
        val expanded = broadcast(beamDf.alias("bm"))
          .join(adj.alias("ad"), col("bm.vec_id") === col("ad.node_id"))
          .select(col("bm.query_id").as("query_id"), col("ad.neighbor_id").as("vec_id"))
        val cand = beamDf.union(expanded)
        (topOf(score(cand), beam).localCheckpoint(false), vis.union(cand))
    }
    val topk = topKByDist(col("vec_id"), col("dist"), k)
    val rerankSet = allowed match {
      case Some(ok) => visited.join(ok.select(col("vec_id")), Seq("vec_id"), "left_semi")
      case None => visited
    }
    score(rerankSet)
      .groupBy(col("query_id"))
      .agg(topk.as("nn"))
      .select(col("query_id"), posexplode(col("nn")).as(Seq("pos", "neighbor_id")))
      .select(col("query_id"), col("neighbor_id"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
