package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's log-analytics verbs (SURVEY §2.5 M5-M9) generalized to
  * any (key, order, value) stream. In the reference these run over the
  * benchmark's own measurement log; here they run over the `events`
  * fixture — same shapes: windowed summaries, cross-client aggregation,
  * sentinel-region pairing, sessionization.
  *
  * All operators are single-pass window/aggregation plans: one shuffle on
  * the partition key, no driver-side loops — the 100 TB path is "partition
  * by key, window within partition".
  */
object MetricsAnalytics {

  /** M5 tail-window summary — mean of the last n rows per key
    * (`np.mean(log['qps'][-5:])`, /root/reference/dynamic_script_faiss.py:120-125). */
  def tailSummary(df: DataFrame, key: Column, order: Seq[Column], value: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order.map(_.desc): _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .groupBy(key)
      // sum in integer cents: 2-decimal inputs make this exact, immune to
      // engine-specific summation order and round-half rules
      .agg(round(sum(value * 100)).cast("long").as("sum_cents"), count(lit(1)).as("n_rows"))
  }

  /** M6 head-window summary — first n rows per key
    * (`lines[:5]`, /root/reference/plots.py:32). */
  def headSummary(df: DataFrame, key: Column, order: Seq[Column], value: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
      .groupBy(key)
      .agg(round(sum(value * 100)).cast("long").as("sum_cents"), count(lit(1)).as("n_rows"))
  }

  /** M7 cross-client aggregation — per backend/client-count: mean latency,
    * mean qps, sum qps, mean recall (/root/reference/multi_tenant_script.py:175-180).
    * Generalized: group by `key`, mean + sum + count of `value`. */
  def crossClientAgg(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key)
      .agg(
        round(sum(value * 100)).cast("long").as("sum_cents"),
        count(lit(1)).as("n_rows"))

  /** M8/M9 sentinel-region pairing — the reference injects start/end
    * sentinel rows into the metric stream and pairs them into shaded
    * regions (`zip(events[-1], events[-2])`, /root/reference/logs/plot.py:27-37).
    * Generalized: for each `startType` row, find the first `endType` row
    * strictly after it within the same key — a conditional-min window,
    * no self-join. Output: (key, start_event_id, start_ms, end_ms). */
  def regionPairs(df: DataFrame, key: Column, ts: Column, eventId: Column,
      eventType: Column, startType: String, endType: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, eventId)
      .rowsBetween(1, Window.unboundedFollowing)
    df.filter(eventType.isin(startType, endType))
      .withColumn("end_ms", min(when(eventType === endType, unix_millis(ts))).over(w))
      .filter(eventType === startType && col("end_ms").isNotNull)
      .select(
        key.as("key"),
        eventId.as("start_event_id"),
        unix_millis(ts).as("start_ms"),
        col("end_ms"))
  }

  /** Gap-based sessionization — the metric stream's interval grouping as
    * event-time sessions: a new session starts when the gap to the previous
    * event of the same key exceeds `gapMs`. */
  def sessionize(df: DataFrame, key: Column, ts: Column, eventId: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, eventId)
    df.withColumn("prev_ms", lag(unix_millis(ts), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ms").isNull || unix_millis(ts) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(key.as("key"), eventId.as("event_id"), col("session_id"))
  }

  /** Time-series resample with gap filling: bucket events into fixed
    * `stepMs` intervals, generate the COMPLETE interval grid between the
    * observed min and max (one `sequence` + explode — no driver loop),
    * and carry the last observed aggregate forward across empty buckets
    * (LOCF). The grid is a single row exploded into the timeline, so the
    * only shuffle is the per-bucket aggregation itself; the forward fill
    * is one window pass over the (small) bucket table, not the raw
    * stream. The empty-bucket rows are what monitoring queries miss when
    * they `GROUP BY` the raw stream — a gap renders as "no row", not as
    * a measured zero. */
  def gapFillLocf(df: DataFrame, ts: Column, value: Column, stepMs: Long): DataFrame = {
    // floor-to-bucket in exact int64 (Column `/` would be double division)
    val bucket = unix_millis(ts) - pmod(unix_millis(ts), lit(stepMs))
    val perBucket = df
      .groupBy(bucket.as("bucket_ms"))
      .agg(count(lit(1)).as("n_events"), sum(value).as("bucket_sum"))
    val grid = perBucket
      .agg(min(col("bucket_ms")).as("lo"), max(col("bucket_ms")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(stepMs))).as("bucket_ms"))
    val wFill = Window.orderBy(col("bucket_ms"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(perBucket, Seq("bucket_ms"), "left")
      .select(
        col("bucket_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("bucket_sum"), ignoreNulls = true).over(wFill).as("filled_sum"))
      // the LOCF window reads the elapsed-time bucket grid, not the raw
      // stream; the guard enforces that claim at runtime (WindowAuditSpec
      // allowlists metrics_gapfill on it)
      .transform(graft.functions.Guards.boundedWindow(_, "metrics_gapfill"))
  }
}
