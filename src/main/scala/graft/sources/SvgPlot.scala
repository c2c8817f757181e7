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
  *
  * Charts carry the reference figures' decorations (plots.py:68-93 title /
  * axis labels / grid / stacked legends; logs/plot.py:51-64 combined
  * legend + axis labels): an axis frame, 5 ticks per axis with integer
  * value labels, title, axis-label text and a per-series legend — all as
  * `<line>`/`<text>` elements with integer attributes, so the document
  * stays byte-replayable by the SQL oracle.
  */
object SvgPlot {

  /** ViewBox of every chart this sink emits (fixed like the reference's
    * figsize at plots.py:48). */
  val W = 640
  val H = 400

  /** Ticks per axis (matplotlib draws ~5-7 major ticks on these ranges). */
  val Ticks = 5

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

  /** Driver-side twins of [[scaled]]/[[px]]/[[py]] for extrema already
    * collected to longs (tick geometry): same floor semantics — the
    * numerator is nonnegative, so long truncation IS floor, and the
    * double division of exact longs matches the column path bit-for-bit. */
  private[graft] def scaledVal(v: Long, vmin: Long, vmax: Long, extent: Int): Long =
    math.floor((v - vmin).toDouble * (extent - 1) /
      math.max(vmax - vmin, 1L).toDouble).toLong
  private[graft] def pxVal(x: Long, xmin: Long, xmax: Long): Long =
    scaledVal(x, xmin, xmax, W)
  private[graft] def pyVal(y: Long, ymin: Long, ymax: Long): Long =
    (H - 1).toLong - scaledVal(y, ymin, ymax, H)

  /** The i-th tick value on [vmin, vmax]: vmin + range·i/Ticks−1, floor —
    * range·i ≥ 0 so `/` (trunc) equals floor, matching SQL `//`. */
  private[graft] def tickVal(vmin: Long, vmax: Long, i: Int): Long =
    vmin + (vmax - vmin) * i / (Ticks - 1)

  /** Labels may not contain SVG/PDF-active characters: the sinks splice
    * them into both markup and PDF string ops unescaped, and the oracle
    * replays the same bytes. */
  private[graft] def checkLabel(s: String): String = {
    // ASCII-only explicitly: isLetterOrDigit alone admits non-ASCII
    // letters, which break the PDF sink's chars==bytes /Length
    // arithmetic and the US_ASCII file write
    require(s.forall(c => c < 128 &&
        (c.isLetterOrDigit || c == ' ' || c == '-' || c == '%')),
      s"chart label '$s' must be ASCII [A-Za-z0-9 %-] only (spliced into SVG and PDF unescaped)")
    s
  }

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

  // ── decorations (plots.py:68-93, logs/plot.py:51-64) ────────────────

  /** Axis frame: left edge + bottom edge, one constant polyline. */
  private[graft] val AxisElem =
    s"""<polyline class="axis" fill="none" points="0,0 0,${H - 1} ${W - 1},${H - 1}"/>"""

  /** The 5 bottom-edge ticks + integer value labels for an x domain. */
  private[graft] def xTickElems(xmin: Long, xmax: Long): String =
    (0 until Ticks).map { i =>
      val v = tickVal(xmin, xmax, i)
      val p = pxVal(v, xmin, xmax)
      s"""<line class="tick" x1="$p" y1="${H - 1}" x2="$p" y2="${H - 7}"/>""" +
        s"""<text class="xtick" x="$p" y="${H - 10}">$v</text>"""
    }.mkString

  /** The 5 left-edge ticks + integer value labels for a y domain; `side`
    * picks the left or right edge (the dual-axis chart labels its second
    * series on the right, matplotlib's twinx). */
  private[graft] def yTickElems(ymin: Long, ymax: Long,
      cls: String = "ytick", right: Boolean = false): String =
    (0 until Ticks).map { i =>
      val v = tickVal(ymin, ymax, i)
      val p = pyVal(v, ymin, ymax)
      if (right)
        s"""<line class="tick" x1="${W - 7}" y1="$p" x2="${W - 1}" y2="$p"/>""" +
          s"""<text class="$cls" x="${W - 80}" y="$p">$v</text>"""
      else
        s"""<line class="tick" x1="0" y1="$p" x2="6" y2="$p"/>""" +
          s"""<text class="$cls" x="8" y="$p">$v</text>"""
    }.mkString

  /** Title + axis-label text elements (empty labels render nothing). */
  private[graft] def labelElems(title: String, xlabel: String, ylabel: String,
      y2label: String = ""): String = {
    val t = if (title.isEmpty) ""
      else s"""<text class="title" x="${W / 2}" y="14">${checkLabel(title)}</text>"""
    val xl = if (xlabel.isEmpty) ""
      else s"""<text class="xlabel" x="${W / 2}" y="${H - 24}">${checkLabel(xlabel)}</text>"""
    val yl = if (ylabel.isEmpty) ""
      else s"""<text class="ylabel" x="12" y="${H / 2}" transform="rotate(-90 12 ${H / 2})">${checkLabel(ylabel)}</text>"""
    val y2 = if (y2label.isEmpty) ""
      else s"""<text class="y2label" x="${W - 12}" y="${H / 2}" transform="rotate(90 ${W - 12} ${H / 2})">${checkLabel(y2label)}</text>"""
    t + xl + yl + y2
  }

  /** One legend text entry at rank `i` (0-based, stacked top-right —
    * plots.py:85-93 builds the same stacked corner legends). */
  private[graft] def legendY(i: Int): Int = 20 + 14 * i
  private[graft] def legendEntry(label: String, i: Int): String =
    s"""<text class="legend" x="${W - 120}" y="${legendY(i)}">$label</text>"""

  /** Multi-series single-axis line chart (plots.py:47-95): one polyline per
    * series over a shared y scale, series drawn in name order (the
    * reference's legend order), then a per-series legend column. Input:
    * (series string, x long, ybp long) rows; x is an ordinal shared across
    * series (interval number). Output: one row (n_series, n_points, svg).
    *
    * Scale shape: the global x/y extrema are a 1-row aggregate collected
    * to literals — the point pass AND the tick geometry both consume them,
    * and two branches never exchange-reuse a broadcast aggregate (the same
    * policy as [[dualAxisChart]]); points are pixel-bucketed per
    * (series, px) with `max` as the visual envelope, so the per-series
    * point count is ≤ W regardless of input rows.
    */
  def multiSeriesChart(rows: DataFrame, series: Column, x: Column, ybp: Column,
      title: String = "", xlabel: String = "", ylabel: String = ""): DataFrame = {
    val base = rows.select(series.as("s"), x.as("x"), ybp.as("y"))
    // extrema + series-name validation in ONE pass: series values are
    // spliced into class attributes, legend text (and the PDF twin's
    // text ops) unescaped, so markup/PDF-active characters in DATA
    // must fail loudly, not corrupt the document
    val e = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"),
      max(coalesce(col("s").rlike("[^A-Za-z0-9 %_.-]").cast("int"), lit(1))).as("badS")).head()
    require(!e.isNullAt(0), "multiSeriesChart: rows input is empty")
    require(e.getInt(4) == 0,
      "multiSeriesChart: series values must be ASCII [A-Za-z0-9 %_.-] " +
        "(spliced into markup and legend text unescaped)")
    val (xmin, xmax, ymin, ymax) =
      (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    val decor = AxisElem + xTickElems(xmin, xmax) + yTickElems(ymin, ymax) +
      labelElems(title, xlabel, ylabel)
    val pts = base
      .select(col("s"),
        px(col("x"), lit(xmin), lit(xmax)).as("px"),
        py(col("y"), lit(ymin), lit(ymax)).as("py"))
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
      document(concat(
        lit(decor),
        array_join(
          transform(array_sort(collect_list(struct(col("s"), col("elem")))),
            e => e.getField("elem")),
          ""),
        // stacked legend, one text entry per series in name order
        array_join(
          transform(array_sort(collect_list(struct(col("s"), col("elem")))),
            (e, i) => concat(
              lit(s"""<text class="legend" x="${W - 120}" y=""""),
              (lit(20) + i * 14).cast("string"),
              lit("\">"), e.getField("s"), lit("</text>"))),
          ""))).as("svg"))
  }

  /** Dual-axis chart with shaded regions (logs/plot.py:39-70): two series
    * over the SAME x axis but INDEPENDENT y scales (matplotlib's twinx),
    * plus full-height region rects drawn before the lines, left/right
    * tick columns for the two scales and a combined legend
    * (logs/plot.py:51-64). Inputs: `rows` = (x long, abp long, bbp long);
    * `regions` = (xs long, xe long, cls string) in the same x domain.
    * Output: one row (n_points, n_regions, svg) — both lines share the
    * pixel-bucket count.
    */
  def dualAxisChart(rows: DataFrame, regions: DataFrame,
      title: String = "", xlabel: String = "", ylabel: String = "",
      y2label: String = "", aLabel: String = "", bLabel: String = "",
      regionLabel: String = ""): DataFrame = {
    val base = rows.select(col("x"), col("abp"), col("bbp"))
    // The extrema are a 1-row, 6-long model artifact consumed by the
    // line pass, the region pass AND the tick geometry; materializing
    // them once as literals costs one driver row and saves repeated full
    // extrema scans of the input (identical aggregate subtrees don't
    // exchange-reuse across branches). Same policy as the centroid /
    // cutoff artifacts elsewhere: collect model-sized, never data-sized.
    val e = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("abp")).as("amin"), max(col("abp")).as("amax"),
      min(col("bbp")).as("bmin"), max(col("bbp")).as("bmax")).head()
    require(!e.isNullAt(0), "dualAxisChart: rows input is empty")
    val Seq(xminV, xmaxV, aminV, amaxV, bminV, bmaxV) = (0 until 6).map(e.getLong)
    val Seq(xmin, xmax, amin, amax, bmin, bmax) =
      Seq(xminV, xmaxV, aminV, amaxV, bminV, bmaxV).map(lit)
    val decor = AxisElem + xTickElems(xminV, xmaxV) +
      yTickElems(aminV, amaxV) + yTickElems(bminV, bmaxV, "ytick2", right = true) +
      labelElems(title, xlabel, ylabel, y2label)
    val legend = Seq(aLabel, bLabel, regionLabel).filter(_.nonEmpty)
      .zipWithIndex.map { case (l, i) => legendEntry(checkLabel(l), i) }.mkString
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
      document(concat(lit(decor), col("rect_elems"), col("line_elems"),
        lit(legend))).as("svg"))
  }
}
