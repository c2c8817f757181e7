package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable space-saving (Metwally et al. 2005) heavy-hitter summary —
  * the deterministic counter-based sibling of the CMS sketch already in
  * the suite (`cms_heavy_users`): capacity-m counter tables built per
  * partition, merged associatively (Agarwal et al., "Mergeable
  * Summaries", PODS 2012), giving for every key an overestimate
  * `true ≤ est ≤ true + N/m` from a summary of m entries however many
  * rows or partitions contributed.
  *
  * Scale design: each partition folds its rows into ONE m-entry table;
  * only those model-sized tables move (treeReduce, log rounds). No
  * keyed shuffle of the data ever happens — at 100 TB this is the
  * "top talkers without a groupBy" monitor, and the merged artifact is
  * KB-sized.
  */
object SpaceSaving {

  /** Counter table: key → (count upper bound, overestimation error).
    * Invariant: `size ≤ capacity`; absent keys have true count ≤
    * `floor` (the min count when full, 0 otherwise). */
  final case class Summary(capacity: Int, counts: Map[Long, (Long, Long)])
      extends Serializable {

    private def floor: Long =
      if (counts.size < capacity) 0L else counts.valuesIterator.map(_._1).min

    def add(key: Long): Summary =
      counts.get(key) match {
        case Some((c, e)) => copy(counts = counts.updated(key, (c + 1, e)))
        case None if counts.size < capacity =>
          copy(counts = counts.updated(key, (1L, 0L)))
        case None =>
          // evict the min-count entry (smallest key on ties → the fold is
          // insertion-order independent only in its BOUNDS, which is all
          // the guarantee promises); new key inherits min as error
          val (mk, (mc, _)) = counts.minBy { case (k, (c, _)) => (c, k) }
          copy(counts = counts - mk + (key -> (mc + 1, mc)))
      }

    /** Estimated count (upper bound) for any key, present or evicted. */
    def estimate(key: Long): Long = counts.get(key).map(_._1).getOrElse(floor)

    /** Overestimation bound for `key`: est − err ≤ true ≤ est. */
    def error(key: Long): Long = counts.get(key).map(_._2).getOrElse(floor)

    /** Associative merge: absent keys contribute their summary's floor
      * (count AND error — the floor is pure overestimation), then the
      * combined table is re-truncated to capacity keeping the largest
      * counts. */
    def merge(other: Summary): Summary = {
      val cap = math.max(capacity, other.capacity)
      val f1 = floor
      val f2 = other.floor
      val keys = counts.keySet ++ other.counts.keySet
      val combined = keys.iterator.map { k =>
        val (c1, e1) = counts.getOrElse(k, (f1, f1))
        val (c2, e2) = other.counts.getOrElse(k, (f2, f2))
        k -> (c1 + c2, e1 + e2)
      }.toMap
      if (combined.size <= cap) Summary(cap, combined)
      else {
        val kept = combined.toSeq
          .sortBy { case (k, (c, _)) => (-c, k) }
          .take(cap).toMap
        Summary(cap, kept)
      }
    }
  }

  object Summary {
    def empty(capacity: Int): Summary = Summary(capacity, Map.empty)
  }

  /** Build the corpus-level summary of `keyCol` with `capacity`
    * counters: per-partition fold, treeReduce merge. The result lives on
    * the driver and is artifact-sized (≤ capacity entries). */
  def summarize(df: DataFrame, keyCol: String, capacity: Int): Summary = {
    val keys = df.select(col(keyCol).cast("long")).na.drop()
    keys.rdd.map(_.getLong(0)).mapPartitions { it =>
      Iterator.single(it.foldLeft(Summary.empty(capacity))(_.add(_)))
    }.treeReduce((a, b) => a.merge(b), depth = 2)
  }

  /** The checked query: exact top-k keys by frequency, each annotated
    * with whether the summary's estimate honors the space-saving
    * guarantee `n_exact ≤ est ≤ n_exact + N/capacity`. Booleans, not
    * estimates, are the output — partition-layout independent. */
  def heavyHitters(spark: SparkSession, df: DataFrame, keyCol: String,
      capacity: Int, k: Int): DataFrame =
    checkedAgainst(spark, df, keyCol, summarize(df, keyCol, capacity), k)

  /** Bound-check a PREBUILT summary (e.g. one folded across streaming
    * micro-batches) against the exact top-k of `df`. The N/capacity
    * slack survives any merge tree: per-partition floors are pure
    * overestimation and merge adds them, so the combined error is still
    * ≤ (Σ batch sizes)/capacity = N/capacity. */
  def checkedAgainst(spark: SparkSession, df: DataFrame, keyCol: String,
      summary: Summary, k: Int): DataFrame = {
    import spark.implicits._
    val n = df.count()
    val slack = n / summary.capacity
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol)).limit(k).collect()
    exact.toSeq.map { r =>
      val (key, nx) = (r.getLong(0), r.getLong(1))
      val est = summary.estimate(key)
      (key, nx, est >= nx && est - nx <= slack)
    }.toDF(keyCol, "n_exact", "within_bound")
  }
}
