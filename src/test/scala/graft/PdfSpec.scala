package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.PdfPlot

/** S6 PDF sink: the emitted document must be a structurally valid PDF —
  * every xref offset must land exactly on its `N 0 obj` header, the
  * content stream's /Length must equal the stream's byte count, and
  * startxref must land on `xref` — and a bit-identical function of its
  * input (two renders agree). These are the invariants a PDF reader
  * actually checks; validating them here means the oracle's byte replay
  * (pdf_interval_chart) is checking a REAL document, not a string that
  * merely looks like one. */
class PdfSpec extends AnyFunSuite {
  import SparkTestSession.spark

  val dir = "/root/testdata/sf0.001"

  private def render(): (Long, Long, Long, String) = {
    val row = PdfPlot.multiSeriesPdf(
      spark.read.parquet(s"$dir/events.parquet"),
      col("event_type"),
      (pmod(col("event_id"), lit(5L)) + 1L).cast("long"),
      floor(col("value") * 100).cast("long"),
      title = "Value over First 5 Intervals", xlabel = "Interval",
      ylabel = "Value bp").head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getString(3))
  }

  test("xref offsets, /Length and startxref are byte-exact") {
    val (nSeries, nPoints, contentLen, pdf) = render()
    assert(nSeries == 5) // the 5 event types
    assert(nPoints >= nSeries) // ≥1 bucketed point per series
    assert(pdf.startsWith("%PDF-1.4\n") && pdf.endsWith("%%EOF\n"))
    // every xref entry points at its object header
    val xrefAt = pdf.indexOf("xref\n0 5\n")
    val entries = pdf.substring(xrefAt + 9, xrefAt + 9 + 5 * 20).grouped(20).toSeq
    assert(entries.head == "0000000000 65535 f \n")
    entries.tail.zipWithIndex.foreach { case (e, i) =>
      val off = e.take(10).toInt
      assert(pdf.startsWith(s"${i + 1} 0 obj\n", off),
        s"xref entry ${i + 1} points at offset $off, found: " +
          pdf.substring(off, math.min(off + 12, pdf.length)))
    }
    // /Length equals the exact stream byte count
    val lenField = raw"<< /Length (\d+) >>".r.findFirstMatchIn(pdf).get.group(1).toLong
    val streamStart = pdf.indexOf("stream\n") + 7
    val streamEnd = pdf.indexOf("endstream")
    assert(lenField == streamEnd - streamStart)
    assert(lenField == contentLen)
    // startxref points at the xref table
    val sxr = pdf.substring(pdf.indexOf("startxref\n") + 10).takeWhile(_ != '\n').toInt
    assert(pdf.startsWith("xref\n", sxr))
    // pure ASCII: chars == bytes, so the length arithmetic above is bytes
    assert(pdf.forall(_ < 128))
    val streams = pdf.substring(streamStart, streamEnd)
    // stroked-block inventory: 1 axis frame + 10 ticks + nSeries paths
    // + nSeries legend swatches
    assert(streams.split("\n").count(_.endsWith(" S")) == 1 + 10 + 2 * nSeries)
    // path grammar: `x y m` starts — axis 1, ticks 10, series nSeries,
    // legend swatches nSeries
    assert("""\d+ \d+ m""".r.findAllIn(streams).size == 11 + 2 * nSeries)
    // decorations are a contract: the Helvetica resource, tick labels,
    // title/axis labels and the per-series legend (plots.py:68-93)
    assert(pdf.contains("/BaseFont /Helvetica"))
    assert("""Tf \d+ 10 Td \(-?\d+\) Tj ET""".r.findAllIn(streams).size == 5) // x ticks
    assert("""Tf 8 \d+ Td \(-?\d+\) Tj ET""".r.findAllIn(streams).size >= 5) // y ticks
    assert(streams.contains("(Value over First 5 Intervals) Tj"))
    assert(streams.contains("(Interval) Tj"))
    assert(streams.contains("Tm (Value bp) Tj")) // rotated y label
    // legend: one label per series, preceded by the black-fill reset
    assert(streams.contains("0 0 0 rg\n"))
    assert("""Tf 544 \d+ Td \([^)]+\) Tj ET""".r.findAllIn(streams).size == nSeries)
  }

  private def assertValidPdf(pdf: String): Unit = {
    assert(pdf.startsWith("%PDF-1.4\n") && pdf.endsWith("%%EOF\n"))
    val xrefAt = pdf.indexOf("xref\n0 5\n")
    val entries = pdf.substring(xrefAt + 9, xrefAt + 9 + 5 * 20).grouped(20).toSeq
    entries.tail.zipWithIndex.foreach { case (e, i) =>
      assert(pdf.startsWith(s"${i + 1} 0 obj\n", e.take(10).toInt))
    }
    val lenField = raw"<< /Length (\d+) >>".r.findFirstMatchIn(pdf).get.group(1).toLong
    assert(lenField == pdf.indexOf("endstream") - (pdf.indexOf("stream\n") + 7))
    val sxr = pdf.substring(pdf.indexOf("startxref\n") + 10).takeWhile(_ != '\n').toInt
    assert(pdf.startsWith("xref\n", sxr))
    assert(pdf.forall(_ < 128))
  }

  test("dual-axis chart paints region fills under the two stroked paths") {
    import graft.operators.MetricsAnalytics
    val ev = graft.sources.Tables.events(spark, dir)
    val rows = ev.select(
      unix_millis(col("ts")).as("x"),
      floor(col("value") * 100).cast("long").as("abp"),
      floor(col("value") * 200).cast("long").as("bbp"))
    val regions = MetricsAnalytics.regionPairs(
        ev, col("user_id"), col("ts"), col("event_id"), col("event_type"),
        "signup", "purchase")
      .orderBy((col("end_ms") - col("start_ms")).desc, col("start_ms"),
        col("start_event_id"))
      .limit(3)
      .select(col("start_ms").as("xs"), col("end_ms").as("xe"))
    val row = PdfPlot.dualAxisPdf(rows, regions,
      title = "QPS and Latency with Phase Regions", xlabel = "Time ms",
      ylabel = "QPS bp", y2label = "Latency bp",
      aLabel = "QPS", bLabel = "Latency", regionLabel = "Phase").head()
    val (nRegions, pdf) = (row.getLong(1), row.getString(3))
    assertValidPdf(pdf)
    val content = pdf.substring(pdf.indexOf("stream\n") + 7, pdf.indexOf("endstream"))
    assert(content.split("\n").count(_.endsWith(" re f")) == nRegions)
    // paint order: every region fill precedes the first SERIES stroke
    // (the decor frame/ticks legitimately precede the fills)
    assert(content.lastIndexOf(" re f") < content.indexOf("0 0 1 RG 1 w"))
    // exactly two series path starts after the series strokes begin
    val seriesOn = content.substring(content.indexOf("0 0 1 RG 1 w"))
    val beforeLegend = seriesOn.substring(0, seriesOn.indexOf("0 0 0 rg"))
    assert("""\d+ \d+ m""".r.findAllIn(beforeLegend).size == 2)
    // left AND right tick columns (independent scales, twinx)
    assert("""(?m)^0 \d+ m 6 \d+ l S$""".r.findAllIn(content).size == 5)
    assert("""(?m)^633 \d+ m 639 \d+ l S$""".r.findAllIn(content).size == 5)
    // combined legend (logs/plot.py:51-64): three entries in order
    assert(content.contains("(QPS) Tj"))
    assert(content.contains("(Latency) Tj"))
    assert(content.contains("(Phase) Tj"))
    assert(content.contains("Tm (QPS bp) Tj") && content.contains("Tm (Latency bp) Tj"))
    // independent y scales: both paths stay inside the page box
    val coords = raw"(\d+) (\d+) [ml]".r.findAllMatchIn(content).toSeq
    assert(coords.nonEmpty)
    coords.foreach { m =>
      assert(m.group(1).toInt < 640 && m.group(2).toInt < 400)
    }
  }

  test("document is deterministic and the file sink round-trips") {
    val a = render()._4
    val b = render()._4
    assert(a == b, "two renders of the same input differ")
    val path = "target/pdf_spec_chart.pdf"
    PdfPlot.write(
      PdfPlot.multiSeriesPdf(
        spark.read.parquet(s"$dir/events.parquet"),
        col("event_type"),
        (pmod(col("event_id"), lit(5L)) + 1L).cast("long"),
        floor(col("value") * 100).cast("long"),
        title = "Value over First 5 Intervals", xlabel = "Interval",
        ylabel = "Value bp"),
      path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(new String(bytes, java.nio.charset.StandardCharsets.US_ASCII) == a)
  }
}
