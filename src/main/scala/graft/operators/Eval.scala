package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation over scored rows — the threshold-free
  * complement to the per-query metrics (`ndcg_at_10`, `map_at_10`,
  * `knn_label_mrr`). Arithmetic is exact int64 end to end (scores are
  * pre-quantized integers; AUC is the Mann–Whitney pair count), so any
  * engine replays the result bit-for-bit.
  */
object Eval {

  /** EXCLUSIVE global running sum of `valCol` in `orderCol` order,
    * WITHOUT a single-partition window: range-repartition on the order
    * key, per-partition window prefix (parallel), plus a driver-computed
    * per-partition offset — the driver holds ONE long per partition,
    * never data. `orderCol` values must be unique (group rows first);
    * range partitioning would otherwise split ties across a boundary
    * and make "strictly below" ambiguous.
    *
    * The range repartition is a shuffle Spark plans anyway for a global
    * sort; the difference from `Window.orderBy(global)` is that the
    * prefix windows then run per partition in parallel instead of
    * funneling 100 TB through one task. */
  def withExclusivePrefixSum(df: DataFrame, orderCol: String, valCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      // freeze the pid assignment: the offsets aggregate and the final
      // window must observe the SAME partitioning
      .localCheckpoint()
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sum(col(valCol)).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive offsets in pid (= range) order — RangePartitioner assigns
    // ascending key ranges to ascending partition ids
    var acc = 0L
    val offsets = (0 until p).map { pid =>
      val o = acc; acc += partSums.getOrElse(pid, 0L); pid -> o
    }.toMap
    val offLit = map((0 until p).flatMap(pid =>
      Seq(lit(pid), lit(offsets(pid)))): _*)
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn(outCol,
        coalesce(sum(col(valCol)).over(w), lit(0L)) +
          element_at(offLit, col("__pid")))
      .drop("__pid")
  }

  /** 1-based global row_number over a UNIQUE total order, without the
    * single-partition window `row_number().over(Window.orderBy(...))`
    * plans: the order tuple becomes one orderable struct, rows
    * range-repartition on it, and the rank is the exclusive
    * prefix-count-of-rows plus one — per-partition parallel windows with
    * driver-held offsets (one long per partition), the same machinery as
    * [[aucBps]]. The order must be unique (include a tiebreaker column)
    * or ranks at a range boundary would be ambiguous. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column], outCol: String): DataFrame =
    withExclusivePrefixSum(
      df.withColumn("__ord", struct(order: _*)).withColumn("__one", lit(1L)),
      "__ord", "__one", outCol)
      .withColumn(outCol, col(outCol) + lit(1L))
      .drop("__ord", "__one")

  /** Per-group 1-based row_number over a UNIQUE within-group total order,
    * in ONE prefix machine: where N independent
    * [[withGlobalRowNumber]] calls each pay a range-sampling job, a
    * localCheckpoint materialization and an offsets collect, this ranks
    * every group in a single range shuffle keyed (group, order...) — the
    * driver holds one long per (partition, group) pair, so `groupCol`
    * must be LOW-cardinality (metric ids, list ids) and integral (in
    * [0, 2^32), validated against the census). Use it whenever a query
    * needs several data-sized global ranks (RFM's three quartiles,
    * RRF's per-list ranks).
    *
    * Measured-size policy (same as `Graph.pageRankInt`'s driver-solve):
    * a map-side-combined per-group census sizes the input first; at or
    * under `smallMaxRows` total rows the rank is a plain group-partitioned
    * window (the census bounds any one task), and only above it does the
    * range-shuffle prefix machine — with its sampling job, checkpoint and
    * offsets collect — pay for itself. */
  // Measured-small results return LAZY plans over a persisted input, so
  // the cache entry must outlive the call — but a long-lived session
  // issuing many distinct withGroupedRowNumber inputs would otherwise
  // accumulate unbounded MEMORY_ONLY entries (CacheManager dedup only
  // collapses identical plans). Bound the footprint with a small FIFO:
  // evicting an entry a consumer hasn't materialized yet is safe —
  // MEMORY_ONLY unpersist degrades that consumer to recompute, never to
  // a wrong answer. 8 entries × ≤ smallMaxRows rows is the cap.
  private val smallCacheFifo =
    new java.util.ArrayDeque[org.apache.spark.sql.DataFrame]()
  private def retainSmallCache(d: DataFrame): Unit = smallCacheFifo.synchronized {
    // dedupe by plan, not reference: a re-run of the same query persists
    // an identical plan that SHARES one CacheManager entry — a second
    // deque slot for it would both halve the effective capacity and,
    // worse, unpersist the shared entry while the newer slot still
    // "retains" it
    import scala.jdk.CollectionConverters._
    // drop entries whose CONTEXT is stopped first: unpersist on a dead
    // context throws inside an unrelated live query's retain call, and
    // stale entries otherwise consume the 8-slot capacity (ADVICE r7).
    // Entries from other LIVE sessions stay counted — the shared-context
    // CacheManager is one pool, and evicting them via the Try-unpersist
    // below still releases their storage (dropping them untracked would
    // reintroduce the unbounded growth this FIFO exists to bound).
    smallCacheFifo.removeIf(e => e.sparkSession.sparkContext.isStopped)
    val plan = d.queryExecution.analyzed
    if (!smallCacheFifo.asScala.exists(_.queryExecution.analyzed.sameResult(plan))) {
      smallCacheFifo.addLast(d)
      while (smallCacheFifo.size() > 8)
        scala.util.Try(smallCacheFifo.removeFirst().unpersist(blocking = false))
    }
  }

  def withGroupedRowNumber(df: DataFrame, groupCol: String, order: Seq[Column],
      outCol: String, smallMaxRows: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    // persist, not localCheckpoint: the census job then computes the
    // (often expensive) upstream lineage, fills the cache and aggregates
    // in ONE pass — a checkpoint costs a separate materialization job
    // first (measured +0.4–0.5 s per call at sf0.1). MEMORY_ONLY so an
    // oversized input degrades to recompute, never to disk.
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val census =
      try {
        val rows = cached.groupBy(col(groupCol).cast("long").as("__g"))
          .agg(count(lit(1)).as("__c")).collect()
        rows.foreach { r =>
          require(!r.isNullAt(0),
            s"withGroupedRowNumber group column '$groupCol' has a null " +
              "(or non-integral) group id; group ids must be longs in [0, 2^32)")
          val g = r.getLong(0)
          require(g >= 0L && g < 4294967296L,
            s"withGroupedRowNumber group id $g outside [0, 2^32): the " +
              "(partition, group) offset key packs the group into the low 32 bits")
        }
        rows
      } catch {
        // a failed census must not strand its cache entry in the manager
        case e: Throwable => cached.unpersist(blocking = false); throw e
      }
    val total = census.map(_.getLong(1)).sum
    if (total <= smallMaxRows) {
      // Measured-small path: per-group window — partitioned (WindowAudit
      // structural pass) and bounded at `total` rows per task by the
      // census just taken. Also the empty-input path: a zero-entry map
      // literal would fail analysis below. The cache entry outlives the
      // call (the result is still lazy), which is the point — the rank
      // pass reads it instead of recomputing the lineage; the CacheManager
      // dedups identical plans, so a re-run query reuses rather than
      // stacks entries, and the FIFO registry bounds how many DISTINCT
      // inputs can hold entries at once (evicted ⇒ recompute, see above).
      retainSmallCache(cached)
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      return cached.withColumn(outCol, row_number().over(w).cast("long"))
    }
    val p = spark.sparkContext.defaultParallelism
    val ranged = cached
      .withColumn("__ord", struct((col(groupCol) +: order): _*))
      .repartitionByRange(p, col("__ord"))
      .withColumn("__pid", spark_partition_id())
      // freeze the pid assignment: the offsets aggregate and the final
      // window must observe the SAME partitioning
      .localCheckpoint()
    // the checkpoint above is eager, so the census cache has now served
    // both of its reads (census + range shuffle) and can go
    cached.unpersist(blocking = false)
    val counts = ranged
      .groupBy(col("__pid"), col(groupCol).cast("long").as("__g"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
    // exclusive per-group offsets in pid order (range order is
    // group-major because the group leads the range key)
    val offsets = counts.groupBy(_._1._2).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._1._1).toSeq.map { case ((pid, _), c) =>
        val o = acc; acc += c; (pid, g) -> o
      }
    }
    val offLit = map(offsets.toSeq.flatMap { case ((pid, g), o) =>
      Seq(lit(pid.toLong * 4294967296L + g), lit(o))
    }: _*)
    val w = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn(outCol,
        coalesce(count(lit(1)).over(w), lit(0L)) + lit(1L) +
          element_at(offLit,
            col("__pid").cast("long") * lit(4294967296L) + col(groupCol).cast("long")))
      .drop("__pid", "__ord")
  }

  /** Exact AUC from integer scores: Mann–Whitney with tie credit.
    * u2 = 2·#\{(pos, neg): score_pos > score_neg\} + #\{ties\} — an
    * integer, so auc = u2 / (2·nPos·nNeg) needs no floats until the
    * final basis-point division.
    *
    * Scale shape: ONE groupBy on the score (map-side combined), the
    * parallel prefix sum above for "negatives strictly below", one
    * scalar aggregate. No pairwise join ever materializes — the naive
    * formulation is nPos·nNeg pairs; this is |distinct scores| rows.
    *
    * `pos` must be a 0/1 integer column. Output: one row
    * (n_pos, n_neg, u2, auc_bps). */
  def aucBps(scored: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(col(posCol)).as("np"),
        sum(lit(1L) - col(posCol)).as("nn"))
    val pre = withExclusivePrefixSum(g, "s", "nn", "neg_below")
    pre.agg(
        sum(col("np")).as("n_pos"),
        sum(col("nn")).as("n_neg"),
        sum(lit(2L) * col("np") * col("neg_below") + col("np") * col("nn"))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("(10000 * u2) div (2 * n_pos * n_neg)").as("auc_bps"))
  }
}
