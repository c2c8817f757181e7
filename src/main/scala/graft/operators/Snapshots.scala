package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot DML (SURVEY §2.4 D1-D4). The reference's five embedded backends
  * implement update as *rebuild on a new snapshot* — searches keep reading
  * the old structure until the swap (`/root/reference/dynamic_script_faiss.py:92-113`).
  * That is Spark's native model: every operation here returns a new
  * immutable DataFrame; concurrent readers of the old snapshot are
  * isolated for free (SURVEY §2.6 C2).
  */
object Snapshots {

  /** D1 bulk insert. `dedupe=true` reproduces Redis's existence-guarded
    * upsert (`dynamic_script_redis.py:49-55`) as a left-anti join. */
  def insert(base: DataFrame, rows: DataFrame, idCol: String = "vec_id", dedupe: Boolean = false): DataFrame = {
    val fresh =
      if (dedupe) rows.join(base.select(idCol), Seq(idCol), "left_anti")
      else rows
    base.unionByName(fresh)
  }

  /** D2 delete by id set — Milvus `delete(f"id in {…}")`
    * (`dynamic_script_milvus.py:133-138`) as an anti-join. */
  def deleteByIds(base: DataFrame, ids: DataFrame, idCol: String = "vec_id"): DataFrame =
    base.join(ids.select(idCol), Seq(idCol), "left_anti")

  /** D3/D4 delete-by-range: the reference's `xb[:n-u]` survivor slice
    * (`dynamic_script_faiss.py:96`) as a range predicate. */
  def deleteSuffix(base: DataFrame, cutoff: Long, idCol: String = "vec_id"): DataFrame =
    base.filter(col(idCol) < cutoff)

  /** The re-insert slice `xb[n-u:]` (`dynamic_script_faiss.py:108`). */
  def suffix(base: DataFrame, cutoff: Long, idCol: String = "vec_id"): DataFrame =
    base.filter(col(idCol) >= cutoff)

  /** The reference's observed invariant (SURVEY §5): delete∘insert =
    * identity. Returns the post-cycle snapshot: delete the suffix then
    * re-insert the same rows. kNN results on it must equal the baseline. */
  /** Snapshot reconciliation: classify every key as insert / delete /
    * update between two table versions — the diff that drives incremental
    * publication, CDC backfills, and data-quality audits. One full-outer
    * hash join on the key (the minimal shuffle for the semantics; with
    * both sides bucketed on the key it runs shuffle-free), payload
    * comparison is null-safe per column, and `unchanged` rows — the
    * overwhelming majority at 100 TB — are dropped before anything else
    * touches them. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      col(keyCol) +: payloadCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("__in_old"): _*)
    val n = newDf.select(
      col(keyCol) +: payloadCols.map(c => col(c).as(s"new_$c")) :+ lit(1).as("__in_new"): _*)
    val changed = payloadCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop("__in_old", "__in_new")
  }

  /** MERGE INTO — the conditional-clause upsert of the lakehouse DML
    * surface (ANSI SQL:2003 MERGE; Delta/Iceberg `whenMatched…`):
    *
    *   WHEN MATCHED AND deleteWhen(source)  THEN DELETE
    *   WHEN MATCHED                         THEN UPDATE SET payload = source.*
    *   WHEN NOT MATCHED [BY TARGET]         THEN INSERT source.*
    *   WHEN NOT MATCHED BY SOURCE           THEN keep target row
    *
    * Distinct from [[diff]] (which classifies two snapshots) and from the
    * changelog fold (`cdc_apply`, which replays an ordered event log):
    * MERGE applies ONE source batch with per-clause conditions in a
    * single pass. Implementation is the minimal shuffle for the
    * semantics — one full-outer hash join on the key (broadcast when the
    * source batch is small, the common case for incremental loads; with
    * both sides bucketed on the key, shuffle-free). Emits the merged
    * snapshot plus the action taken per surviving row ('keep' / 'update'
    * / 'insert'); deleted rows are absent.
    *
    * `deleteWhen` is evaluated over the SOURCE payload columns (prefixed
    * `src_`), matching MERGE's clause scoping. */
  def mergeInto(target: DataFrame, source: DataFrame, keyCol: String,
      payloadCols: Seq[String], deleteWhen: Column): DataFrame = {
    val t = target.select(
      col(keyCol) +: payloadCols.map(c => col(c).as(s"tgt_$c")): _*)
    val s = source.select(
      col(keyCol) +: payloadCols.map(c => col(c).as(s"src_$c")): _*)
    val joined = t.withColumn("__in_tgt", lit(1))
      .join(s.withColumn("__in_src", lit(1)), Seq(keyCol), "full_outer")
    val out = joined
      .withColumn("action",
        when(col("__in_tgt").isNull, lit("insert"))
          .when(col("__in_src").isNull, lit("keep"))
          .when(deleteWhen, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("action") =!= "delete")
    out.select(
      col(keyCol) +:
        payloadCols.map(c =>
          when(col("action") === "keep", col(s"tgt_$c"))
            .otherwise(col(s"src_$c")).as(c)) :+
        col("action"): _*)
  }

  def deleteInsertCycle(base: DataFrame, cutoff: Long, idCol: String = "vec_id"): DataFrame =
    insert(deleteSuffix(base, cutoff, idCol), suffix(base, cutoff, idCol), idCol)

  /** SCD Type-2 history build from a change event stream: per key, each
    * run of consecutive identical states collapses to one versioned row
    * with a [valid_from, valid_to) interval; the open row carries
    * valid_to = −1 and is_current = true.
    *
    * The run-collapse is the lag≠current filter, validity is lead() over
    * the surviving rows, and version is row_number — three window passes
    * over ONE partitioning (key, ordered by time), so the whole build is
    * a single shuffle at any scale. Times are integer epoch-ms so the
    * interval arithmetic replays exactly in any engine.
    *
    * `tsCol` must be a timestamp; `tieCol` breaks equal-timestamp ties
    * deterministically. */
  def scd2(events: DataFrame, keyCol: String, stateCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    // both windows order by the SAME (ms, tie) key — ordering by the raw
    // timestamp in one and its ms truncation in the other could disagree
    // for sub-millisecond neighbors
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ms"), col(tieCol))
    val changes = events
      .select(col(keyCol), col(stateCol), unix_millis(col(tsCol)).as("__ms"), col(tieCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      // null-safe: the first row per key (prev = null) always survives
      .filter(!(col(stateCol) <=> col("__prev")))
    changes.select(
      col(keyCol),
      col(stateCol),
      row_number().over(w).as("version"),
      col("__ms").as("valid_from_ms"),
      coalesce(lead(col("__ms"), 1).over(w), lit(-1L)).as("valid_to_ms"),
      lead(col("__ms"), 1).over(w).isNull.as("is_current"))
  }
}
