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
  * 3 0 obj  << /Type /Page /MediaBox [0 0 640 400] ... >>
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
    s"$W $H] /Contents 4 0 R >>\nendobj\n"
  private val Obj4Mid = " >>\nstream\n"
  private val Obj4End = "endstream\nendobj\n"
  private[sources] val Off1: Long = Header.length.toLong
  private[sources] val Off2: Long = Off1 + Obj1.length
  private[sources] val Off3: Long = Off2 + Obj2.length
  private[sources] val Off4: Long = Off3 + Obj3.length

  /** Multi-series line chart as one PDF document. Input rows:
    * (series string, x long, y basis points long) — the same contract as
    * [[SvgPlot.multiSeriesChart]]. Output: one row
    * (n_series, n_points, content_len, pdf).
    *
    * Scale shape: identical to the SVG sink — 1-row extrema broadcast,
    * per-(series, px) pixel-bucket aggregation bounds every path at W
    * points, and the document assembly is string expressions over the
    * few-series aggregate. */
  def multiSeriesPdf(rows: DataFrame, series: Column, x: Column, ybp: Column): DataFrame = {
    val base = rows.select(series.as("s"), x.as("x"), ybp.as("y"))
    val ext = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("y")).as("ymin"), max(col("y")).as("ymax"))
    val pts = base.crossJoin(broadcast(ext))
      .select(col("s"),
        SvgPlot.px(col("x"), col("xmin"), col("xmax")).as("px"),
        // PDF y grows up: the unflipped scaled value IS the PDF pixel
        SvgPlot.scaled(col("y"), col("ymin"), col("ymax"), H).as("py"))
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
      array_join(
        transform(array_sort(collect_list(struct(col("s"), col("path")))),
          (e, i) => concat(
            element_at(palette, pmod(i, lit(6)).cast("int") + 1),
            lit(" RG 1 w\n"), e.getField("path"), lit(" S\n"))),
        "").as("content"))
    doc.select(
      col("n_series"), col("n_points"),
      length(col("content")).cast("long").as("content_len"),
      assemble(col("content")).as("pdf"))
  }

  /** Dual-axis chart with shaded regions as one PDF document — the PDF
    * twin of [[SvgPlot.dualAxisChart]] (logs/plot.py's twinx QPS/latency
    * figure): two series over the SAME x axis with INDEPENDENT y scales,
    * plus full-height filled region rects painted UNDER the lines
    * (`re f` fill ops before the stroked paths — PDF paints in content
    * order, like SVG document order). Inputs match the SVG sink:
    * `rows` = (x, abp, bbp), `regions` = (xs, xe, cls). Output: one row
    * (n_points, n_regions, content_len, pdf). */
  def dualAxisPdf(rows: DataFrame, regions: DataFrame): DataFrame = {
    val base = rows.select(col("x"), col("abp"), col("bbp"))
    // same 1-row-to-literals extrema policy as the SVG twin: both the
    // line pass and the region pass consume them, and the two branches
    // would not exchange-reuse the aggregate
    val e = base.agg(
      min(col("x")).as("xmin"), max(col("x")).as("xmax"),
      min(col("abp")).as("amin"), max(col("abp")).as("amax"),
      min(col("bbp")).as("bmin"), max(col("bbp")).as("bmax")).head()
    require(!e.isNullAt(0), "dualAxisPdf: rows input is empty")
    val Seq(xmin, xmax, amin, amax, bmin, bmax) =
      (0 until 6).map(i => lit(e.getLong(i)))
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
      length(concat(col("rect_ops"), col("line_ops"))).cast("long").as("content_len"),
      assemble(concat(col("rect_ops"), col("line_ops"))).as("pdf"))
  }

  /** Wrap a finished content stream into the full PDF byte string —
    * object 4's /Length, the xref offsets and startxref all derive from
    * part lengths, so the document stays valid for ANY content. */
  private[sources] def assemble(content: Column): Column = {
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
