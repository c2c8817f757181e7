package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable deterministic quantile summary — the rank-query member of
  * the sketch family next to CMS (`cms_heavy_users`), HLL
  * (`hll_union_groups`/`hll_intersect_est`) and space-saving
  * (`topk_freq_sketch`). Multilevel halving buffers in the
  * Munro–Paterson / MRL line (Manku, Rajagopalan, Lindsay, SIGMOD 1998;
  * the randomized descendant is KLL): level i holds items of weight 2^i;
  * a full level sorts and keeps every second item, pushing the survivors
  * one level up. Compaction is DETERMINISTIC (odd indices — no coin
  * flip), so the guarantee is a worst-case rank-error bound the sketch
  * itself carries: one halving of a weight-w buffer moves any item's
  * rank by at most w, so `errBound` accumulates w per compaction and
  * |sketchRank(v) − trueRank(v)| ≤ errBound always holds — the checked
  * invariant, partition-layout independent even though the concrete
  * estimates are not (same contract as the space-saving summary).
  *
  * Scale design: each partition folds its rows into one sketch of
  * O(k·log(n/k)) longs; only those KB-sized artifacts move (treeReduce,
  * log rounds). No sort, no keyed shuffle of the data — at 100 TB this
  * is "percentiles without a global sort", and the merged artifact
  * answers any quantile offline.
  */
object QuantileSketch {

  /** `levels(i)` holds UNSORTED items of weight 2^i (sorted lazily at
    * compaction); `n` is the exact item count; `errBound` the
    * accumulated worst-case rank error. */
  final case class Sketch(k: Int, n: Long, errBound: Long,
      levels: Vector[Vector[Long]]) extends Serializable {

    private def cap: Int = 2 * k

    def add(v: Long): Sketch = {
      val l0 = if (levels.isEmpty) Vector(Vector(v))
        else levels.updated(0, levels(0) :+ v)
      Sketch(k, n + 1, errBound, l0).compactAll()
    }

    /** Bottom-up: halve any over-full level. An odd-sized buffer leaves
      * its max behind so halving is exact; survivors are the odd sorted
      * indices (1, 3, …) — rank shift ≤ one item-weight per compaction. */
    private def compactAll(): Sketch = {
      var ls = levels
      var err = errBound
      var i = 0
      while (i < ls.length) {
        if (ls(i).length >= cap) {
          val sorted = ls(i).sorted
          val even = sorted.length - (sorted.length % 2)
          val survivors = (1 until even by 2).map(sorted).toVector
          val leftover = if (even < sorted.length) Vector(sorted.last) else Vector.empty
          ls = ls.updated(i, leftover)
          if (i + 1 < ls.length) ls = ls.updated(i + 1, ls(i + 1) ++ survivors)
          else ls = ls :+ survivors
          err += (1L << i)
        }
        i += 1
      }
      Sketch(k, n, err, ls)
    }

    /** Associative-in-bounds merge: concatenate level-wise, re-compact;
      * error bounds add. */
    def merge(other: Sketch): Sketch = {
      val len = math.max(levels.length, other.levels.length)
      val ls = Vector.tabulate(len) { i =>
        levels.applyOrElse(i, (_: Int) => Vector.empty[Long]) ++
          other.levels.applyOrElse(i, (_: Int) => Vector.empty[Long])
      }
      Sketch(math.max(k, other.k), n + other.n, errBound + other.errBound, ls)
        .compactAll()
    }

    /** Value whose weighted sketch-rank first reaches `target`
      * (0-indexed over n items). True rank is within ±errBound. */
    def query(target: Long): Long = {
      val items = levels.zipWithIndex
        .flatMap { case (buf, i) => buf.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      var acc = 0L
      for ((v, w) <- items) {
        acc += w
        if (acc > target) return v
      }
      items.last._1
    }
  }

  object Sketch {
    def empty(k: Int): Sketch = Sketch(k, 0L, 0L, Vector.empty)
  }

  /** Mutable per-partition accumulator — same levels/halving as
    * [[Sketch]] but array-backed so the hot `add` path allocates
    * nothing per row (the immutable Sketch stays the merge/query/wire
    * format). */
  final class Builder(val k: Int) extends Serializable {
    private val cap = 2 * k
    private var n = 0L
    private var err = 0L
    private val levels = scala.collection.mutable.ArrayBuffer(
      new scala.collection.mutable.ArrayBuffer[Long](cap))

    def count: Long = n
    def errBound: Long = err
    def levelSnapshot: IndexedSeq[IndexedSeq[Long]] = levels.map(_.toIndexedSeq).toIndexedSeq

    def add(v: Long): Unit = {
      levels(0) += v
      n += 1
      compactAll()
    }

    /** Level-wise append of another builder's buffers, then re-compact —
      * the mutable twin of [[Sketch.merge]]; bounds add. */
    def mergeFrom(o: Builder): Unit = {
      val os = o.levelSnapshot
      var i = 0
      while (i < os.length) {
        if (i >= levels.length)
          levels += new scala.collection.mutable.ArrayBuffer[Long](cap)
        levels(i) ++= os(i)
        i += 1
      }
      n += o.n
      err += o.err
      compactAll()
    }

    /** Restore one level verbatim (deserialization path). */
    def loadLevel(i: Int, vals: Array[Long]): Unit = {
      while (i >= levels.length)
        levels += new scala.collection.mutable.ArrayBuffer[Long](cap)
      levels(i) ++= vals
    }
    def loadCounts(n0: Long, err0: Long): Unit = { n = n0; err = err0 }

    private def compactAll(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= cap) {
          val sorted = levels(i).toArray
          java.util.Arrays.sort(sorted)
          val even = sorted.length - (sorted.length % 2)
          if (i + 1 >= levels.length)
            levels += new scala.collection.mutable.ArrayBuffer[Long](cap)
          var j = 1
          while (j < even) { levels(i + 1) += sorted(j); j += 2 }
          levels(i).clear()
          if (even < sorted.length) levels(i) += sorted(sorted.length - 1)
          err += (1L << i)
        }
        i += 1
      }
    }

    def result(): Sketch = Sketch(k, n, err, levels.map(_.toVector).toVector)
  }

  /** Per-partition fold + tree merge, same shape as
    * [[SpaceSaving.summarize]]. */
  def summarize(df: DataFrame, valCol: String, k: Int): Sketch = {
    val vals = df.select(col(valCol).cast("long")).na.drop()
    vals.rdd.map(_.getLong(0)).mapPartitions { it =>
      val b = new Builder(k)
      it.foreach(b.add)
      Iterator.single(b.result())
    }.treeReduce((a, b) => a.merge(b), depth = 2)
  }

  /** The checked query: for each requested quantile (basis points), the
    * EXACT order statistic at rank floor((n−1)·q/10000) plus whether the
    * sketch's estimate honors the carried bound — the estimate's true
    * rank interval [#\{x<v\}, #\{x≤v\}] must overlap
    * [target − errBound, target + errBound]. Booleans, not estimates,
    * are the output (partition-layout independent). */
  def checkedQuantiles(spark: SparkSession, df: DataFrame, valCol: String,
      k: Int, qBps: Seq[Int]): DataFrame = {
    val vals = df.select(col(valCol).cast("long").as("v")).na.drop()
      .localCheckpoint() // three passes: sketch, sorted ranks, bound counts
    // job 1: the sketch (per-partition fold, tree merge)
    val sketch = summarize(vals, "v", k)
    checkedAgainst(spark, vals, sketch, qBps)
  }

  /** Validate an already-built sketch (batch or stream-folded) against
    * the exact order statistics of `vals` (single `v: long` column):
    * one distributed sort pass for the exact values, one aggregate for
    * all rank intervals. */
  def checkedAgainst(spark: SparkSession, vals: DataFrame, sketch: Sketch,
      qBps: Seq[Int]): DataFrame = {
    import spark.implicits._
    val n = sketch.n
    val targets = qBps.map(q => (n - 1) * q / 10000)
    val ests = targets.map(sketch.query)
    // job 2: ALL exact order statistics in one distributed sort pass
    val targetSet = targets.toSet
    val exactByRank = vals.orderBy(col("v")).rdd.map(_.getLong(0))
      .zipWithIndex()
      .filter { case (_, i) => targetSet.contains(i) }
      .map(_.swap).collectAsMap()
    // job 3: ALL rank-interval counts for the bound check in one agg
    val cntExprs = ests.zipWithIndex.flatMap { case (e, i) => Seq(
      sum(when(col("v") < e, 1L).otherwise(0L)).as(s"lt_$i"),
      sum(when(col("v") <= e, 1L).otherwise(0L)).as(s"le_$i")) }
    val cnts = vals.agg(cntExprs.head, cntExprs.tail: _*).head()
    qBps.indices.map { i =>
      val target = targets(i)
      val nLess = cnts.getLong(2 * i)
      val nLeq = cnts.getLong(2 * i + 1)
      val ok = nLess - sketch.errBound <= target && target <= nLeq + sketch.errBound
      (qBps(i).toLong, exactByRank(target), ok)
    }.toDF("q_bps", "exact_cents", "within_bound")
  }
}
