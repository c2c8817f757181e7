package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6 — the reference's plot sink in its ACTUAL output format: the
  * reference writes PDF figures (plots.py:93-95 `savefig(...pdf)`,
  * dynamic_script_milvus.py:160-176). [[SvgPlot]] renders the chart
  * shapes as SVG; this sink emits the same multi-series line chart as a
  * complete, valid, single-page PDF 1.4 document — uncompressed vector
  * content, fixed object layout, no timestamps or IDs — so the whole
  * file is a DETERMINISTIC pure function of the input rows that a SQL
  * oracle replays byte-for-byte (matplotlib's PDFs are not: they embed
  * creation dates, font subsets and zlib streams).
  *
  * Layout (all ASCII, `\n` line ends, offsets exact by construction):
  * {{{
  * %PDF-1.4
  * 1 0 obj  << /Type /Catalog ... >>          (catalog)
  * 2 0 obj  << /Type /Pages ... >>            (page tree)
  * 3 0 obj  << /Type /Page /MediaBox [0 0 640 400]
  *             /Resources << /Font << /F1 Helvetica >> >> ... >>
  * 4 0 obj  << /Length N >> stream ... endstream   (vector content)
  * xref     (five 20-byte entries, offsets computed from part lengths)
  * trailer  << /Size 5 /Root 1 0 R >> + startxref
  * }}}
  *
  * The content stream draws one polyline path per series — `r g b RG`
  * stroke color from a fixed 6-color integer palette by series rank,
  * `x y m` / `x y l` / `S` path ops — using [[SvgPlot]]'s integer pixel
  * math (values enter as basis points, pixel-bucketed BEFORE
  * aggregation, so a page never carries more points than horizontal
  * pixels no matter how many rows feed it). PDF's y axis grows upward,
  * so the y pixel is the UNFLIPPED `scaled()` value — the one place the
  * two sinks differ.
  *
  * Decorations match the reference figures (plots.py:68-93 title / axis
  * labels / legends; logs/plot.py:51-64): an axis frame + 5 ticks per
  * axis stroked as short segments, and title / axis labels / per-series
  * legend as standard-Helvetica text ops (`BT /F1 n Tf x y Td (s) Tj
  * ET` — no font embedding, integer coordinates), keeping the document
  * byte-deterministic.
  */
object PdfPlot {

  /** Page box, matching [[SvgPlot.W]]/[[SvgPlot.H]]. */
  val W: Int = SvgPlot.W
  val H: Int = SvgPlot.H

  /** Stroke palette: integer-token RGB triples (no float formatting in
    * the output), assigned by series rank mod 6 — the role the
    * reference's per-backend matplotlib colors play. */
  val Palette: Seq[String] =
    Seq("0 0 1", "1 0 0", "0 1 0", "1 0 1", "0 1 1", "1 1 0")

  // Constant document parts. Lengths (and therefore the first four xref
  // offsets) are compile-time constants; only the content stream varies.
  private val Header = "%PDF-1.4\n"
  private val Obj1 = "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
  private val Obj2 = "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
  private val Obj3 = "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 " +
    s"$W $H] /Resources << /Font << /F1 << /Type /Font /Subtype /Type1 " +
    "/BaseFont /Helvetica >> >> >> /Contents 4 0 R >>\nendobj\n"
  private val Obj4Mid = " >>\nstream\n"
  private val Obj4End = "endstream\nendobj\n"
  private[graft] val Off1: Long = Header.length.toLong
  private[graft] val Off2: Long = Off1 + Obj1.length
  private[graft] val Off3: Long = Off2 + Obj2.length
  private[graft] val Off4: Long = Off3 + Obj3.length

  /** The constant document pieces around object 4, exposed so the SQL
    * oracles splice the EXACT same bytes (computed offsets included)
    * instead of hand-maintaining them: everything before obj4, and
    * everything between obj4 and the startxref value. */
  private[graft] val DocPrefix: String = Header + Obj1 + Obj2 + Obj3
  private[graft] val XrefAndTrailer: String =
    "xref\n0 5\n0000000000 65535 f \n" +
      Seq(Off1, Off2, Off3, Off4).map(o => f"$o%010d 00000 n \n").mkString +
      "trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"

  // ── decoration ops (the PDF twins of SvgPlot's decor elements) ──────

  /** One text op: black fill is set by the decor prologue / legend
    * prologue; `(` `)` `\` never appear (checkLabel guards labels and
    * tick labels are integers). */
  private[graft] def textOp(size: Int, x: Long, y: Long, s: String): String =
    s"BT /F1 $size Tf $x $y Td ($s) Tj ET\n"

  /** Rotated y-axis label (text matrix = 90° rotation at (x, y)). */
  private[graft] def vTextOp(size: Int, x: Int, y: Int, s: String): String =
    s"BT /F1 $size Tf 0 1 -1 0 $x $y Tm ($s) Tj ET\n"

  /** Axis frame: left edge + bottom edge, one stroked path (PDF y grows
    * up: the frame runs top-left → origin → bottom-right). */
  private[graft] val AxisOps = s"0 0 0 RG 1 w\n0 ${H - 1} m 0 0 l ${W - 1} 0 l S\n"

  /** 5 bottom-edge ticks + integer labels for the x domain. */
  private[graft] def xTickOps(xmin: Long, xmax: Long): String =
    (0 until SvgPlot.Ticks).map { i =>
      val v = SvgPlot.tickVal(xmin, xmax, i)
      val p = SvgPlot.pxVal(v, xmin, xmax)
      s"$p 0 m $p 6 l S\n" + textOp(8, p, 10, v.toString)
    }.mkString

  /** 5 left- (or right-) edge ticks + integer labels for a y domain —
    * PDF y is the UNFLIPPED scaled value. */
  private[graft] def yTickOps(ymin: Long, ymax: Long, right: Boolean = false): String =
    (0 until SvgPlot.Ticks).map { i =>
      val v = SvgPlot.tickVal(ymin, ymax, i)
      val p = SvgPlot.scaledVal(v, ymin, ymax, H)
      if (right) s"${W - 7} $p m ${W - 1} $p l S\n" + textOp(8, W - 80, p, v.toString)
      else s"0 $p m 6 $p l S\n" + textOp(8, 8, p, v.toString)
    }.mkString

  /** Title + axis-label text ops (empty labels render nothing). */
  private[graft] def labelOps(title: String, xlabel: String, ylabel: String,
      y2label: String = ""): String = {
    import SvgPlot.checkLabel
    val t = if (title.isEmpty) "" else textOp(12, W / 2 - 120, H - 14, checkLabel(title))
    val xl = if (xlabel.isEmpty) "" else textOp(10, W / 2 - 30, 24, checkLabel(xlabel))
    val yl = if (ylabel.isEmpty) "" else vTextOp(10, 14, H / 2 - 30, checkLabel(ylabel))
    val y2 = if (y2label.isEmpty) "" else vTextOp(10, W - 14, H / 2 - 30, checkLabel(y2label))
    t + xl + yl + y2
  }

  /** Legend entry rank `i` (stacked top-right like the reference's
    * stacked corner legends): a color swatch stroke + black label.
    * Prologue `0 0 0 rg` resets the fill after any region `rg`. */
  private[graft] def legendSwatchY(i: Int): Int = H - 20 - 14 * i
  private[graft] def legendOps(entries: Seq[(String, String)]): String =
    if (entries.isEmpty) ""
    else "0 0 0 rg\n" + entries.zipWithIndex.map { case ((color, label), i) =>
      val y = legendSwatchY(i)
      s"$color RG 1 w\n${W - 120} $y m ${W - 100} $y l S\n" +
        textOp(8, W - 96, y - 3, SvgPlot.checkLabel(label))
    }.mkString

  /** Multi-series line chart as one PDF document. Input rows:
    * (series string, x long, y basis points long) — the same contract as
    * [[SvgPlot.multiSeriesChart]]. Output: one row
    * (n_series, n_points, content_len, pdf).
    *
    * Scale shape: identical to the SVG sink — 1-row extrema collected to
    * literals (the point pass and the tick geometry both consume them),
    * per-(series, px) pixel-bucket aggregation bounds every path at W
    * points, and the document assembly is string expressions over the
    * few-series aggregate. */
  def multiSeriesPdf(rows: DataFrame, series: Column, x: Column, ybp: Column,
      title: String = "", xlabel: String = "", ylabel: String = ""): DataFrame = {
    val base = rows.select(series.as("s"), x.as("x"), ybp.as("y"))
    // extrema + series-name validation in ONE pass: series values reach
    // PDF `(...)` string operands in the legend unescaped — `(`/`)`/`\`
    // in data would corrupt the content stream, so fail loudly
    val ext = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"),
      max(coalesce(col("s").rlike("[^A-Za-z0-9 %_.-]").cast("int"), lit(1))).as("badS")).head()
    require(!ext.isNullAt(0), "multiSeriesPdf: rows input is empty")
    require(ext.getInt(4) == 0,
      "multiSeriesPdf: series values must be ASCII [A-Za-z0-9 %_.-] " +
        "(spliced into PDF text ops unescaped)")
    val (xmin, xmax, ymin, ymax) =
      (ext.getLong(0), ext.getLong(1), ext.getLong(2), ext.getLong(3))
    val decor = AxisOps + xTickOps(xmin, xmax) + yTickOps(ymin, ymax) +
      labelOps(title, xlabel, ylabel)
    val pts = base
      .select(col("s"),
        SvgPlot.px(col("x"), lit(xmin), lit(xmax)).as("px"),
        // PDF y grows up: the unflipped scaled value IS the PDF pixel
        SvgPlot.scaled(col("y"), lit(ymin), lit(ymax), H).as("py"))
      .groupBy(col("s"), col("px"))
      // max(py) = max raw y: the same upper envelope the SVG sink keeps
      // (SVG flips first and takes min; PDF takes max unflipped)
      .agg(max(col("py")).as("py"))
    val paths = pts
      .groupBy(col("s"))
      .agg(
        count(lit(1)).as("n_points"),
        array_join(
          transform(array_sort(collect_list(struct(col("px"), col("py")))),
            (p, i) => concat(
              p.getField("px").cast("string"), lit(" "),
              p.getField("py").cast("string"),
              when(i === 0, lit(" m")).otherwise(lit(" l")))),
          " ").as("path"))
    val palette = array(Palette.map(lit): _*)
    val doc = paths.agg(
      count(lit(1)).as("n_series"),
      sum(col("n_points")).as("n_points"),
      concat(
        lit(decor),
        array_join(
          transform(array_sort(collect_list(struct(col("s"), col("path")))),
            (e, i) => concat(
              element_at(palette, pmod(i, lit(6)).cast("int") + 1),
              lit(" RG 1 w\n"), e.getField("path"), lit(" S\n"))),
          ""),
        // per-series legend: swatch stroke + Helvetica label, name order
        lit("0 0 0 rg\n"),
        array_join(
          transform(array_sort(collect_list(struct(col("s"), col("path")))),
            (e, i) => concat(
              element_at(palette, pmod(i, lit(6)).cast("int") + 1),
              lit(s" RG 1 w\n${W - 120} "), (lit(H - 20) - i * 14).cast("string"),
              lit(s" m ${W - 100} "), (lit(H - 20) - i * 14).cast("string"),
              lit(" l S\n"),
              lit(s"BT /F1 8 Tf ${W - 96} "), (lit(H - 23) - i * 14).cast("string"),
              lit(" Td ("), e.getField("s"), lit(") Tj ET\n"))),
          "")).as("content"))
    doc.select(
      col("n_series"), col("n_points"),
      length(col("content")).cast("long").as("content_len"),
      assemble(col("content")).as("pdf"))
  }

  /** Dual-axis chart with shaded regions as one PDF document — the PDF
    * twin of [[SvgPlot.dualAxisChart]] (logs/plot.py's twinx QPS/latency
    * figure): two series over the SAME x axis with INDEPENDENT y scales
    * (left/right tick columns), plus full-height filled region rects
    * painted UNDER the lines (`re f` fill ops before the stroked paths —
    * PDF paints in content order, like SVG document order), and the
    * combined legend of logs/plot.py:51-64. Inputs match the SVG sink:
    * `rows` = (x, abp, bbp), `regions` = (xs, xe, cls). Output: one row
    * (n_points, n_regions, content_len, pdf). */
  def dualAxisPdf(rows: DataFrame, regions: DataFrame,
      title: String = "", xlabel: String = "", ylabel: String = "",
      y2label: String = "", aLabel: String = "", bLabel: String = "",
      regionLabel: String = ""): DataFrame = {
    val base = rows.select(col("x"), col("abp"), col("bbp"))
    // same 1-row-to-literals extrema policy as the SVG twin: the line
    // pass, the region pass and the tick geometry all consume them
    val e = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("abp")).as("amin"), max(col("abp")).as("amax"),
      min(col("bbp")).as("bmin"), max(col("bbp")).as("bmax")).head()
    require(!e.isNullAt(0), "dualAxisPdf: rows input is empty")
    val Seq(xminV, xmaxV, aminV, amaxV, bminV, bmaxV) = (0 until 6).map(e.getLong)
    val Seq(xmin, xmax, amin, amax, bmin, bmax) =
      Seq(xminV, xmaxV, aminV, amaxV, bminV, bmaxV).map(lit)
    val decor = AxisOps + xTickOps(xminV, xmaxV) +
      yTickOps(aminV, amaxV) + yTickOps(bminV, bmaxV, right = true) +
      labelOps(title, xlabel, ylabel, y2label)
    val legend = legendOps(
      Seq("0 0 1" -> aLabel, "1 0 0" -> bLabel, "1 1 0" -> regionLabel)
        .filter(_._2.nonEmpty))
    val bucketed = base
      .select(SvgPlot.px(col("x"), xmin, xmax).as("px"),
        // unflipped: PDF's y axis grows upward
        SvgPlot.scaled(col("abp"), amin, amax, H).as("pya"),
        SvgPlot.scaled(col("bbp"), bmin, bmax, H).as("pyb"))
      .groupBy(col("px"))
      .agg(max(col("pya")).as("pya"), max(col("pyb")).as("pyb"))
    def path(py: String) = array_join(
      transform(array_sort(collect_list(struct(col("px"), col(py)))),
        (p, i) => concat(
          p.getField("px").cast("string"), lit(" "),
          p.getField(py).cast("string"),
          when(i === 0, lit(" m")).otherwise(lit(" l")))),
      " ")
    val lines = bucketed.agg(
      count(lit(1)).as("n_points"),
      path("pya").as("pa"), path("pyb").as("pb"))
      .select(col("n_points"),
        concat(
          lit("0 0 1 RG 1 w\n"), col("pa"), lit(" S\n"),
          lit("1 0 0 RG 1 w\n"), col("pb"), lit(" S\n")).as("line_ops"))
    val rects = regions
      .select(SvgPlot.px(col("xs"), xmin, xmax).as("pxs"),
        SvgPlot.px(col("xe"), xmin, xmax).as("pxe"))
      .agg(
        count(lit(1)).as("n_regions"),
        coalesce(array_join(
          transform(array_sort(collect_list(struct(col("pxs"), col("pxe")))),
            r => concat(
              lit("1 1 0 rg "), r.getField("pxs").cast("string"), lit(" 0 "),
              greatest(r.getField("pxe") - r.getField("pxs"), lit(1L)).cast("string"),
              lit(s" $H re f\n"))),
          ""), lit("")).as("rect_ops"))
    lines.crossJoin(rects).select(
      col("n_points"), col("n_regions"),
      length(concat(lit(decor), col("rect_ops"), col("line_ops"), lit(legend)))
        .cast("long").as("content_len"),
      assemble(concat(lit(decor), col("rect_ops"), col("line_ops"), lit(legend)))
        .as("pdf"))
  }

  /** Wrap a finished content stream into the full PDF byte string —
    * object 4's /Length, the xref offsets and startxref all derive from
    * part lengths, so the document stays valid for ANY content. */
  private[graft] def assemble(content: Column): Column = {
    val obj4 = concat(
      lit("4 0 obj\n<< /Length "), length(content).cast("string"),
      lit(Obj4Mid), content, lit(Obj4End))
    val xrefOff = lit(Off4) + length(obj4).cast("long")
    concat(
      lit(Header + Obj1 + Obj2 + Obj3), obj4,
      lit("xref\n0 5\n0000000000 65535 f \n"),
      lit(Seq(Off1, Off2, Off3, Off4)
        .map(o => f"$o%010d 00000 n \n").mkString),
      lit("trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"),
      xrefOff.cast("string"), lit("\n%%EOF\n"))
  }

  /** File sink: write the (single) pdf column of `doc` to `path`. The
    * document row is a rendered model artifact (one string, bounded by
    * series count × W points) — a driver-side write, same policy as the
    * metric-log sink. */
  def write(doc: DataFrame, path: String): Unit = {
    val pdf = doc.select(col("pdf")).head().getString(0)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      pdf.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ()
  }
}
