package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S6 plot sink semantics: the SVG renderer must emit exactly the
  * document a hand computation produces on a tiny frame, clamp every
  * coordinate to the viewBox, survive degenerate (constant / empty)
  * inputs, and stay pixel-bounded no matter how many rows feed a line —
  * the property that makes a chart renderable from 100 TB of metrics. */
class SvgPlotSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import graft.sources.SvgPlot

  val dir = "/root/testdata/sf0.001"

  test("multiSeriesChart renders the hand-computed document") {
    // Two series over x in {1,2,3}; y already in basis points.
    // Extrema: x 1..3, y 0..300. px = (x-1)*639/2 -> 0,319,639.
    // py = 399 - ybp*399/300 -> y=0:399, 100:266, 200:133, 300:0.
    val rows = Seq(
      ("a", 1L, 0L), ("a", 2L, 300L), ("a", 3L, 150L),
      ("b", 1L, 100L), ("b", 2L, 200L), ("b", 3L, 100L)
    ).toDF("s", "x", "y")
    val out = SvgPlot.multiSeriesChart(rows, col("s"), col("x"), col("y"),
      title = "T chart", xlabel = "X", ylabel = "Y")
      .collect().head
    assert(out.getAs[Long]("n_series") == 2L)
    assert(out.getAs[Long]("n_points") == 6L)
    // decor from the sink's own constant builders, polylines + legend
    // hand-computed — a drift in either halves shows up as a mismatch
    val expected =
      """<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 640 400">""" +
        SvgPlot.AxisElem +
        SvgPlot.xTickElems(1L, 3L) + SvgPlot.yTickElems(0L, 300L) +
        SvgPlot.labelElems("T chart", "X", "Y") +
        """<polyline class="a" fill="none" points="0,399 319,0 639,200"/>""" +
        """<polyline class="b" fill="none" points="0,266 319,133 639,266"/>""" +
        """<text class="legend" x="520" y="20">a</text>""" +
        """<text class="legend" x="520" y="34">b</text>""" +
        "</svg>"
    assert(out.getAs[String]("svg") == expected)
  }

  test("tick elements carry hand-computed values and pixel positions") {
    // x domain 1..3: 5 ticks at values 1,1,2,2,3 -> px 0,0,319,319,639.
    // y domain 0..300: values 0,75,150,225,300 ->
    //   py = 399 - floor(v*399/300) = 399,300,200,100,0.
    val xt = SvgPlot.xTickElems(1L, 3L)
    assert(xt.contains("""<line class="tick" x1="319" y1="399" x2="319" y2="393"/>"""))
    assert(xt.contains("""<text class="xtick" x="319" y="390">2</text>"""))
    assert(xt.contains("""<text class="xtick" x="639" y="390">3</text>"""))
    val yt = SvgPlot.yTickElems(0L, 300L)
    assert(yt.contains("""<line class="tick" x1="0" y1="200" x2="6" y2="200"/>"""))
    assert(yt.contains("""<text class="ytick" x="8" y="200">150</text>"""))
    assert(yt.contains("""<text class="ytick" x="8" y="300">75</text>"""))
    assert(yt.contains("""<text class="ytick" x="8" y="0">300</text>"""))
    // right-edge variant (the dual-axis second scale)
    val yt2 = SvgPlot.yTickElems(0L, 300L, "ytick2", right = true)
    assert(yt2.contains("""<line class="tick" x1="633" y1="200" x2="639" y2="200"/>"""))
    assert(yt2.contains("""<text class="ytick2" x="560" y="200">150</text>"""))
  }

  test("labels are validated against markup-active characters") {
    intercept[IllegalArgumentException] {
      SvgPlot.multiSeriesChart(
        Seq(("s", 1L, 1L)).toDF("s", "x", "y"),
        col("s"), col("x"), col("y"), title = "bad<script>")
        .collect()
    }
  }

  test("pixel bucketing keeps a polyline at most W points wide") {
    // 100k rows on one series must collapse to <= 640 points.
    val rows = spark.range(100000).select(
      lit("s").as("s"), col("id").as("x"), (col("id") % 977).as("y"))
    val out = SvgPlot.multiSeriesChart(rows, col("s"), col("x"), col("y"))
      .collect().head
    assert(out.getAs[Long]("n_series") == 1L)
    assert(out.getAs[Long]("n_points") <= SvgPlot.W)
    // every coordinate stays inside the viewBox
    val pts = """points="([^"]*)"""".r.findAllMatchIn(out.getAs[String]("svg"))
      .flatMap(_.group(1).split(" ")).toSeq
    assert(pts.nonEmpty)
    pts.foreach { p =>
      val Array(x, y) = p.split(",").map(_.toLong)
      assert(x >= 0 && x < SvgPlot.W, s"x out of box: $p")
      assert(y >= 0 && y < SvgPlot.H, s"y out of box: $p")
    }
  }

  test("negative basis points scale exactly like positive ones") {
    // y in [-200, 200]: the offset subtraction happens before any
    // division, so sign never reaches the floor — py spans the full box.
    val rows = Seq(("s", 1L, -200L), ("s", 2L, 0L), ("s", 3L, 200L)).toDF("s", "x", "y")
    val out = SvgPlot.multiSeriesChart(rows, col("s"), col("x"), col("y"))
      .collect().head
    assert(out.getAs[String]("svg").contains("points=\"0,399 319,200 639,0\""))
  }

  test("constant series renders at the divide-by-zero guard coordinates") {
    val rows = Seq(("s", 5L, 42L)).toDF("s", "x", "y")
    val out = SvgPlot.multiSeriesChart(rows, col("s"), col("x"), col("y"))
      .collect().head
    // range 0 on both axes -> scaled 0 -> px=0, py=H-1
    assert(out.getAs[String]("svg").contains("points=\"0,399\""))
  }

  test("dualAxisChart scales axes independently and shades regions first") {
    val rows = Seq(
      (0L, 0L, 1000L), (100L, 50L, 2000L), (200L, 100L, 3000L)
    ).toDF("x", "abp", "bbp")
    // both series span their own full y range -> identical pixel paths
    val regions = Seq((50L, 150L, "phase")).toDF("xs", "xe", "cls")
    val out = SvgPlot.dualAxisChart(rows, regions,
      aLabel = "QPS", bLabel = "Latency", regionLabel = "Phase").collect().head
    assert(out.getAs[Long]("n_points") == 3L)
    assert(out.getAs[Long]("n_regions") == 1L)
    val svg = out.getAs[String]("svg")
    // px: 0, 319, 639; py both: 399, 200, 0 (identical after scaling)
    assert(svg.contains("""<polyline class="a" fill="none" points="0,399 319,200 639,0"/>"""))
    assert(svg.contains("""<polyline class="b" fill="none" points="0,399 319,200 639,0"/>"""))
    // region [50,150] -> pxs=159, pxe=479, width 320; rect precedes the
    // series lines (the axis-frame polyline legitimately precedes both)
    assert(svg.contains("""<rect class="phase" x="159" y="0" width="320" height="400"/>"""))
    assert(svg.indexOf("<rect") < svg.indexOf("<polyline class=\"a\""))
    // both tick columns render: left for a, right for b
    assert(svg.contains("""<text class="ytick" x="8""""))
    assert(svg.contains("""<text class="ytick2" x="560""""))
    // combined legend (logs/plot.py:51-64): stacked entries in order
    assert(svg.contains("""<text class="legend" x="520" y="20">QPS</text>"""))
    assert(svg.contains("""<text class="legend" x="520" y="34">Latency</text>"""))
    assert(svg.contains("""<text class="legend" x="520" y="48">Phase</text>"""))
  }

  test("dualAxisChart with no regions emits a region-free document") {
    val rows = Seq((0L, 1L, 1L), (10L, 2L, 2L)).toDF("x", "abp", "bbp")
    val regions = Seq.empty[(Long, Long, String)].toDF("xs", "xe", "cls")
    val out = SvgPlot.dualAxisChart(rows, regions).collect().head
    assert(out.getAs[Long]("n_regions") == 0L)
    assert(!out.getAs[String]("svg").contains("<rect"))
    assert(out.getAs[String]("svg").startsWith("<svg "))
  }

  test("registered svg queries return one decorated well-formed document each") {
    Seq("svg_interval_chart", "svg_qps_latency_chart", "svg_tenant_curve_chart")
      .foreach { name =>
        val rows = SparkEntry.queries(name)(spark, dir).collect()
        assert(rows.length == 1, name)
        val svg = rows.head.getAs[String]("svg")
        assert(svg.startsWith("<svg xmlns=\"http://www.w3.org/2000/svg\""), name)
        assert(svg.endsWith("</svg>"), name)
        assert(svg.contains("<polyline "), name)
        // decorations are a contract: frame, 10+ ticks, title, axis
        // labels, legend (plots.py:68-93 / logs/plot.py:51-64)
        assert(svg.contains("class=\"axis\""), name)
        assert("""class="tick"""".r.findAllIn(svg).size >= 10, name)
        assert(svg.contains("class=\"title\""), name)
        assert(svg.contains("class=\"xlabel\"") && svg.contains("class=\"ylabel\""), name)
        assert(svg.contains("class=\"legend\""), name)
      }
  }
}
