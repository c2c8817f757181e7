package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair tables (duplicate graphs, shared-feature
  * graphs) — the curation-side centrality signals.
  *
  * Arithmetic is exact int64 throughout: per-neighbor contributions are
  * integer-divided (`score div deg`), damping is a integer
  * multiply-then-divide, and sums of int64 are order-independent — so a
  * fixed iteration count produces the SAME scores in any engine, unlike
  * float PageRank whose per-partition fold order perturbs low bits.
  */
object Graph {

  /** Fixed-iteration integer PageRank over an undirected edge list
    * (columns `src`, `dst`, one row per edge, src < dst convention not
    * required — duplicates and both orientations are normalized away).
    *
    * Per iteration: score'_i = base + (dampNum · Σ_{j∈N(i)} score_j div
    * deg_j) div dampDen, with base = init − init·dampNum div dampDen, so
    * a regular graph stays at `init`. Nodes are those with degree ≥ 1.
    *
    * Scale shape: one shuffle per iteration (contributions keyed by
    * destination) over the adjacency — the classic message-passing
    * round. The adjacency is materialized once; iterations only re-key
    * the score table. Iteration count is fixed (power iteration
    * converges geometrically; rank ordering stabilizes in a handful of
    * rounds), which also keeps the computation replayable.
    *
    * `ckptEvery`: materialize the score table every N iterations. The
    * lineage between checkpoints is a simple chain (each score table is
    * consumed exactly once), so short runs plan as ONE job; long runs
    * still truncate lineage before the plan tree gets deep.
    *
    * Measured-small graphs (≤ `driverSolveMaxEdges` directed edges after
    * normalization) solve on the driver instead: the integer recurrence
    * is order-independent (sums of int64), so the collected solve
    * returns EXACTLY the distributed loop's scores without its ~4
    * scheduler round-trips per iteration — the same policy as
    * [[graft.text.Dedup.duplicateClusters]]. The message-passing loop
    * below stays for the billion-edge graphs a 100 TB crawl produces.
    *
    * Driver-memory note: 1M collected (long, long) tuples box to roughly
    * 60–100 MB of driver heap — the default threshold keeps the solve
    * well inside a stock 1–4 GB driver; raise it only with the driver
    * heap sized to match. */
  def pageRankInt(edges: DataFrame, iters: Int, init: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L, ckptEvery: Int = 5,
      driverSolveMaxEdges: Long = 1000000L): DataFrame = {
    val adj = edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    val base = init - init * dampNum / dampDen
    if (adj.count() <= driverSolveMaxEdges) {
      val e = adj.collect().map(r => (r.getLong(0), r.getLong(1)))
      val deg = new scala.collection.mutable.HashMap[Long, Long].withDefaultValue(0L)
      e.foreach { case (s, _) => deg(s) += 1 }
      var score = deg.keysIterator.map(_ -> init).toMap
      for (_ <- 1 to iters) {
        val sumc = new scala.collection.mutable.HashMap[Long, Long].withDefaultValue(0L)
        e.foreach { case (s, d) => sumc(d) += score(s) / deg(s) }
        score = score.map { case (id, _) => id -> (base + dampNum * sumc(id) / dampDen) }
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return score.toSeq.map { case (id, s) => (id, deg(id), s) }
        .toDF("id", "deg", "score")
    }
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var scores = deg.withColumn("score", lit(init))
    runDistributed(adj, deg, scores, iters, base, dampNum, dampDen, ckptEvery)
  }

  private def runDistributed(adj: DataFrame, deg: DataFrame, init0: DataFrame,
      iters: Int, base: Long, dampNum: Long, dampDen: Long, ckptEvery: Int): DataFrame = {
    var scores = init0
    for (i <- 1 to iters) {
      val contribs = adj
        .join(scores.select(col("id").as("src"), expr("score div deg").as("c")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("sumc"))
      scores = deg.join(contribs, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"($dampNum * coalesce(sumc, 0L)) div $dampDen"))
            .as("score"))
      if (i % ckptEvery == 0 && i < iters) scores = scores.localCheckpoint()
    }
    scores
  }

  /** Per-node triangle counts over an undirected edge list. Edges are
    * oriented low-id → high-id so each triangle {x < y < z} is
    * enumerated exactly once as (x,y)⋈(y,z)⋈(x,z) — two hash equi-joins,
    * no direction double-counting. (At power-law scale the standard
    * upgrade is degree-based orientation, which bounds the join fan-out
    * by arboricity instead of max id-order degree; the enumeration set
    * is identical.) Output: (id, n_triangles) for nodes in ≥ 1
    * triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-round multi-source BFS over an undirected edge list: hop
    * distance from the nearest source, reported for nodes reached within
    * `rounds` hops (sources report 0). Each round relaxes
    * dist(v) ← min(dist(v), min_{u∈N(v)} dist(u)+1) — min() is
    * order-independent, so a fixed round count replays identically in
    * any engine, and after r rounds the reported distances are exact for
    * every node within radius r of a source.
    *
    * Scale shape: per round, ONE keyed shuffle — the current distance
    * table joins the adjacency on its source side (candidate messages)
    * and a groupBy-min folds them with the carried distances. The
    * distance table only ever holds REACHED nodes (frontier-and-settled,
    * not all nodes), so early rounds on a 100 TB-crawl graph move a tiny
    * fraction of the node set; the adjacency is materialized once and
    * reused every round. Graphs measured under `driverSolveMaxEdges`
    * solve on the driver — identical distances (min is associative), no
    * per-round scheduler round-trips — the same policy as
    * [[pageRankInt]] / [[minLabelPropagation]]. */
  def bfsHops(edges: DataFrame, sources: DataFrame, rounds: Int,
      ckptEvery: Int = 5, driverSolveMaxEdges: Long = 1000000L): DataFrame = {
    val adj = edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    val src0 = sources.select(col("id").cast("long").as("id")).distinct()
    if (adj.count() <= driverSolveMaxEdges) {
      val e = adj.collect().map(r => (r.getLong(0), r.getLong(1)))
      var dist = src0.collect().map(r => r.getLong(0) -> 0L).toMap
      for (_ <- 1 to rounds) {
        val next = scala.collection.mutable.HashMap.empty[Long, Long]
        dist.foreach { case (id, d) => next(id) = d }
        e.foreach { case (s, d) =>
          dist.get(s).foreach { ds =>
            if (!next.contains(d) || ds + 1 < next(d)) next(d) = ds + 1 }
        }
        dist = next.toMap
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return dist.toSeq.toDF("id", "hops")
    }
    var dist = src0.withColumn("hops", lit(0L))
    for (i <- 1 to rounds) {
      val msgs = adj
        .join(dist.select(col("id").as("src"), col("hops").as("dh")), Seq("src"))
        .select(col("dst").as("id"), (col("dh") + 1).as("hops"))
      dist = dist.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("hops")).as("hops"))
      if (i % ckptEvery == 0 && i < rounds) dist = dist.localCheckpoint()
    }
    dist
  }

  /** Fixed-round weighted shortest path (multi-source Bellman–Ford)
    * over an undirected edge list carrying an integer weight column
    * `w ≥ 1`: dist(v) ← min(dist(v), min_{u∈N(v)} dist(u) + w(u,v)),
    * reported for nodes reached within `rounds` relaxations (sources
    * report 0). min() is order-independent, so the fixed round count
    * replays identically in any engine, and after r rounds every
    * reported distance is exact for paths of ≤ r edges — the weighted
    * generalization of [[bfsHops]] (which is this with w ≡ 1).
    *
    * Scale shape identical to [[bfsHops]]: per round ONE keyed shuffle
    * (distance table joins the adjacency on its source side, groupBy-min
    * folds candidates with carried distances); the distance table holds
    * only REACHED nodes. Graphs under `driverSolveMaxEdges` solve on the
    * driver — identical distances, min is associative. */
  def ssspWeighted(edges: DataFrame, sources: DataFrame, rounds: Int,
      ckptEvery: Int = 5, driverSolveMaxEdges: Long = 1000000L): DataFrame = {
    val adj = edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
          col("w").cast("long").as("w")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst"),
          col("w").cast("long").as("w")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
      .filter(col("src") =!= col("dst"))
      // parallel edges keep their cheapest weight (mirrors the min-fold)
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .localCheckpoint()
    val src0 = sources.select(col("id").cast("long").as("id")).distinct()
    if (adj.count() <= driverSolveMaxEdges) {
      val e = adj.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      var dist = src0.collect().map(r => r.getLong(0) -> 0L).toMap
      for (_ <- 1 to rounds) {
        val next = scala.collection.mutable.HashMap.empty[Long, Long]
        dist.foreach { case (id, d) => next(id) = d }
        e.foreach { case (s, d, w) =>
          dist.get(s).foreach { ds =>
            if (!next.contains(d) || ds + w < next(d)) next(d) = ds + w }
        }
        dist = next.toMap
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return dist.toSeq.toDF("id", "dist")
    }
    var dist = src0.withColumn("dist", lit(0L))
    for (i <- 1 to rounds) {
      val msgs = adj
        .join(dist.select(col("id").as("src"), col("dist").as("dh")), Seq("src"))
        .select(col("dst").as("id"), (col("dh") + col("w")).as("dist"))
      dist = dist.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
      if (i % ckptEvery == 0 && i < rounds) dist = dist.localCheckpoint()
    }
    dist
  }

  /** Fixed-round min-label propagation over an undirected edge list —
    * the deterministic community/component detector: every node starts
    * labeled with its own id and each round takes the min of its label
    * and its neighbors' (label(v) ← min(label(v), min_{u∈N(v)}
    * label(u))). After r rounds labels agree within radius-r
    * neighborhoods; connected components are the fixpoint. min() is
    * order-independent, so a fixed round count replays identically in
    * any engine (no float damping, no tie-breaking randomness — the
    * difference from classic frequency-based LPA, chosen deliberately:
    * determinism IS the contract here).
    *
    * Scale shape: one keyed shuffle per round over the adjacency, same
    * as [[pageRankInt]]; graphs measured under `driverSolveMaxEdges`
    * solve on the driver (identical labels — min is associative), the
    * message-passing loop remains for crawl-scale graphs. */
  def minLabelPropagation(edges: DataFrame, rounds: Int,
      ckptEvery: Int = 5, driverSolveMaxEdges: Long = 1000000L): DataFrame = {
    val adj = edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    if (adj.count() <= driverSolveMaxEdges) {
      val e = adj.collect().map(r => (r.getLong(0), r.getLong(1)))
      var label = e.iterator.map(_._1).toSet[Long].map(id => id -> id).toMap
      for (_ <- 1 to rounds) {
        val next = scala.collection.mutable.HashMap.empty[Long, Long]
        label.foreach { case (id, l) => next(id) = l }
        e.foreach { case (s, d) => if (label(s) < next(d)) next(d) = label(s) }
        label = next.toMap
      }
      val spark = edges.sparkSession
      import spark.implicits._
      return label.toSeq.toDF("id", "label")
    }
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    for (i <- 1 to rounds) {
      val best = adj
        .join(labels.select(col("id").as("src"), col("label").as("nl")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("nl")).as("min_nl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("min_nl"), col("label"))).as("label"))
      if (i % ckptEvery == 0 && i < rounds) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Fixed-round k-core PEELING over an undirected edge list: each round
    * removes every node whose current degree is < k together with its
    * edges (Matula–Beck peeling, bounded to `rounds` synchronized
    * sweeps — the Pregel-style formulation; the survivors after
    * convergence are exactly the k-core, and after a fixed budget a
    * deterministic superset). Output: (id, peel_round) — the round the
    * node was removed in (1-based), 0 for survivors. Every round is one
    * degree aggregate + two anti-joins keyed by node id; the edge set
    * only shrinks, so the per-round cost is monotonically decreasing —
    * the right shape for the power-law graphs where peeling removes
    * most of the tail in round 1. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj0 = edges.select(explode(array(
        struct(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")),
        struct(col("dst").cast("long").as("src"), col("src").cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint()
    var live = adj0
    var nodes = adj0.select(col("src").as("id")).distinct().localCheckpoint()
    var removed = Seq.empty[(Long, Long)].toDF("id", "peel_round")
    for (r <- 1 to rounds) {
      val deg = live.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      // left join, not inner: a node whose every neighbor was peeled has
      // NO live edges left — absent from deg, but still must be removed
      val doomed = nodes.join(deg, Seq("id"), "left")
        .filter(coalesce(col("deg"), lit(0L)) < k)
        .select(col("id")).localCheckpoint()
      removed = removed.unionByName(
        doomed.select(col("id"), lit(r.toLong).as("peel_round")))
      nodes = nodes.join(doomed, Seq("id"), "left_anti").localCheckpoint()
      live = live
        .join(doomed.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(doomed.select(col("id").as("dst")), Seq("dst"), "left_anti")
        .localCheckpoint()
    }
    removed.unionByName(nodes.select(col("id"), lit(0L).as("peel_round")))
  }
}
