package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's interval-log text format, round-tripped (SURVEY §2.1
  * S4/S5): written at /root/reference/dynamic_script_faiss.py:127-129 as
  *   `Interval {i}: QPS = {q:.2f} queries/sec, Latency = {l:.2f} ms, Recall = {r:.4f}`
  * and regex-parsed back at /root/reference/plots.py:37-43.
  *
  * Sink = `format_string` (printf-compatible with both the reference and
  * DuckDB); source = `regexp_extract` over a text scan.
  */
object MetricLogs {

  val LinePattern = """Interval (\d+): QPS = ([0-9.]+) queries/sec, Latency = ([0-9.]+) ms, Recall = ([0-9.]+)"""

  /** S4 sink: (interval, qps, latency_ms, recall) → formatted log line. */
  def formatLines(metrics: DataFrame): DataFrame =
    metrics.select(format_string(
      "Interval %d: QPS = %.2f queries/sec, Latency = %.2f ms, Recall = %.4f",
      col("interval"), col("qps"), col("latency_ms"), col("recall")).as("line"))

  /** S5 source: log line → typed columns. Non-matching lines are dropped
    * (the tolerant-regex behavior of /root/reference/logs/plot.py:8-32). */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(
        regexp_extract(col("line"), LinePattern, 1).as("interval_s"),
        regexp_extract(col("line"), LinePattern, 2).as("qps_s"),
        regexp_extract(col("line"), LinePattern, 3).as("latency_s"),
        regexp_extract(col("line"), LinePattern, 4).as("recall_s"))
      .filter(col("interval_s") =!= "")
      .select(
        col("interval_s").cast("int").as("interval"),
        col("qps_s").cast("double").as("qps"),
        col("latency_s").cast("double").as("latency_ms"),
        col("recall_s").cast("double").as("recall"))
}
