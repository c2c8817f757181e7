package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6 — the reference's plot sink, Spark-native: render line charts as
  * deterministic SVG documents (reference: plots.py:47-95 draws per-series
  * interval lines; logs/plot.py:39-70 draws a dual-axis QPS/latency chart
  * with shaded insert/delete regions and writes one image per log).
  *
  * The reference rasterizes through matplotlib; a Spark engine renders the
  * same charts as SVG TEXT built from integer pixel coordinates, so the
  * sink is (a) an ordinary DataFrame→string pipeline a DuckDB oracle can
  * replay byte-for-byte, and (b) scale-safe: every polyline is bucketed to
  * the pixel grid BEFORE aggregation, so a chart never carries more points
  * than horizontal pixels no matter how many rows feed it — the downsample
  * IS the aggregation, exactly what a plot of 100 TB of metrics must do.
  *
  * All coordinate math is integer (bigint) arithmetic: y values enter as
  * basis points (`floor(y*100)`), x as epoch ms or interval ordinals, and
  * the scale transform is `(v - vmin) * (extent-1) div max(vmax - vmin, 1)`
  * — identical in Spark and DuckDB, no float formatting anywhere in the
  * output string.
  */
object SvgPlot {

  /** ViewBox of every chart this sink emits (fixed like the reference's
    * figsize at plots.py:48). */
  val W = 640
  val H = 400

  /** Scale a value into [0, extent-1]. The numerator stays a long
    * (≤ range·extent, well under 2^53), the division runs in double —
    * IEEE division of exactly-representable integers is correctly rounded,
    * so `floor` of it is bit-identical in Spark and DuckDB
    * (`CAST(floor((v - vmin) * (e-1) / greatest(vmax - vmin, 1)) AS BIGINT)`).
    * The `greatest(range, 1)` guard makes a constant series render at
    * coordinate 0 instead of dividing by zero. */
  def scaled(v: Column, vmin: Column, vmax: Column, extent: Int): Column =
    floor(((v - vmin) * (extent - 1)).cast("double") /
      greatest(vmax - vmin, lit(1L)).cast("double")).cast("long")

  /** X pixel column: [0, W-1]. */
  def px(x: Column, xmin: Column, xmax: Column): Column =
    scaled(x, xmin, xmax, W)

  /** Y pixel column: [0, H-1], flipped so larger values draw higher
    * (SVG's y axis grows downward). */
  def py(ybp: Column, ymin: Column, ymax: Column): Column =
    lit(H - 1).cast("long") - scaled(ybp, ymin, ymax, H)

  /** One `x,y` point token. */
  def point(pxCol: Column, pyCol: Column): Column =
    concat(pxCol.cast("string"), lit(","), pyCol.cast("string"))

  /** A polyline element for one series: `cls` becomes the class attribute
    * (series identity, like the reference's per-db colors). */
  def polyline(cls: Column, points: Column): Column =
    concat(lit("<polyline class=\""), cls, lit("\" fill=\"none\" points=\""),
      points, lit("\"/>"))

  /** A full-height shaded region rect (logs/plot.py:46-50 axvspan). */
  def regionRect(cls: Column, pxStart: Column, pxEnd: Column): Column =
    concat(lit("<rect class=\""), cls, lit("\" x=\""), pxStart.cast("string"),
      lit("\" y=\"0\" width=\""),
      greatest(pxEnd - pxStart, lit(1L)).cast("string"),
      lit("\" height=\"" + H + "\"/>"))

  /** Wrap chart body elements into an SVG document. */
  def document(body: Column): Column =
    concat(lit(s"""<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 $W $H">"""),
      body, lit("</svg>"))

  /** Multi-series single-axis line chart (plots.py:47-95): one polyline per
    * series over a shared y scale, series drawn in name order (the
    * reference's legend order). Input: (series string, x long, ybp long)
    * rows; x is an ordinal shared across series (interval number).
    * Output: one row (n_series, n_points, svg).
    *
    * Scale shape: the global x/y extrema are a 1-row broadcast; points are
    * pixel-bucketed per (series, px) with `max` as the visual envelope, so
    * the per-series point count is ≤ W regardless of input rows.
    */
  def multiSeriesChart(rows: DataFrame, series: Column, x: Column, ybp: Column): DataFrame = {
    val base = rows.select(series.as("s"), x.as("x"), ybp.as("y"))
    val ext = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val pts = base.crossJoin(broadcast(ext))
      .select(col("s"),
        px(col("x"), col("xmin"), col("xmax")).as("px"),
        py(col("y"), col("ymin"), col("ymax")).as("py"))
      .groupBy(col("s"), col("px"))
      // min(py) = max raw y: the upper envelope of each pixel column
      .agg(min(col("py")).as("py"))
    val lines = pts
      .groupBy(col("s"))
      .agg(
        count(lit(1)).as("n_points"),
        array_join(
          transform(array_sort(collect_list(struct(col("px"), col("py")))),
            p => point(p.getField("px"), p.getField("py"))),
          " ").as("points"))
      .select(col("s"), col("n_points"), polyline(col("s"), col("points")).as("elem"))
    lines.agg(
      count(lit(1)).as("n_series"),
      sum(col("n_points")).as("n_points"),
      document(array_join(
        transform(array_sort(collect_list(struct(col("s"), col("elem")))),
          e => e.getField("elem")),
        "")).as("svg"))
  }

  /** Dual-axis chart with shaded regions (logs/plot.py:39-70): two series
    * over the SAME x axis but INDEPENDENT y scales (matplotlib's twinx),
    * plus full-height region rects drawn before the lines. Inputs:
    * `rows` = (x long, abp long, bbp long); `regions` = (xs long, xe long,
    * cls string) in the same x domain. Output: one row
    * (n_points, n_regions, svg) — both lines share the pixel-bucket count.
    */
  def dualAxisChart(rows: DataFrame, regions: DataFrame): DataFrame = {
    val base = rows.select(col("x"), col("abp"), col("bbp"))
    // The extrema are a 1-row, 6-long model artifact consumed by BOTH the
    // line pass and the region pass; materializing them once as literals
    // costs one driver row and saves a second full extrema scan of the
    // input (the two identical aggregate subtrees don't exchange-reuse
    // across the line/rect branches). Same policy as the centroid /
    // cutoff artifacts elsewhere: collect model-sized, never data-sized.
    val e = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("abp")).as("amin"), max(col("abp")).as("amax"),
      min(col("bbp")).as("bmin"), max(col("bbp")).as("bmax")).head()
    require(!e.isNullAt(0), "dualAxisChart: rows input is empty")
    val Seq(xmin, xmax, amin, amax, bmin, bmax) =
      (0 until 6).map(i => lit(e.getLong(i)))
    val bucketed = base
      .select(px(col("x"), xmin, xmax).as("px"),
        py(col("abp"), amin, amax).as("pya"),
        py(col("bbp"), bmin, bmax).as("pyb"))
      .groupBy(col("px"))
      .agg(min(col("pya")).as("pya"), min(col("pyb")).as("pyb"))
    val lines = bucketed.agg(
      count(lit(1)).as("n_points"),
      array_join(
        transform(array_sort(collect_list(struct(col("px"), col("pya")))),
          p => point(p.getField("px"), p.getField("pya"))),
        " ").as("pa"),
      array_join(
        transform(array_sort(collect_list(struct(col("px"), col("pyb")))),
          p => point(p.getField("px"), p.getField("pyb"))),
        " ").as("pb"))
      .select(col("n_points"),
        concat(polyline(lit("a"), col("pa")), polyline(lit("b"), col("pb"))).as("line_elems"))
    val rects = regions
      .select(col("cls"),
        px(col("xs"), xmin, xmax).as("pxs"),
        px(col("xe"), xmin, xmax).as("pxe"))
      .agg(
        count(lit(1)).as("n_regions"),
        coalesce(array_join(
          transform(array_sort(collect_list(struct(col("pxs"), col("pxe"), col("cls")))),
            r => regionRect(r.getField("cls"), r.getField("pxs"), r.getField("pxe"))),
          ""), lit("")).as("rect_elems"))
    lines.crossJoin(rects).select(
      col("n_points"), col("n_regions"),
      document(concat(col("rect_elems"), col("line_elems"))).as("svg"))
  }
}
