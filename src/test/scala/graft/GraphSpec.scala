package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Graph, RenderedSeries}

/** Pure scene-model tests for the png/svg renderer — no Spark, no image
  * decoding; geometry and styling assertions on the shape list. */
class GraphSpec extends AnyFunSuite {

  private def series(name: String, values: Seq[Double],
                     tags: Map[String, String] = Map.empty) =
    RenderedSeries(name, tags + ("name" -> name), name, start = 0L, step = 60L,
      values = values.toArray)

  test("color resolves graphite names and hex forms") {
    assert(Graph.color("blue") == ((0x6464ff, 0xff)))        // graphite-web 1.1 blue
    assert(Graph.color("green") == ((0x00c800, 0xff)))       // swapped green
    assert(Graph.color("#f00") == ((0xff0000, 0xff)))
    assert(Graph.color("c80032") == ((0xc80032, 0xff)))
    assert(Graph.color("c8003280") == ((0xc80032, 0x80)))
    assert(Graph.color("nosuchcolor") == ((0xafafaf, 0xff))) // grey fallback
  }

  test("fmtAxis uses si suffixes") {
    assert(Graph.fmtAxis(1500) == "1.5K")
    assert(Graph.fmtAxis(2e6) == "2M")
    assert(Graph.fmtAxis(0.5) == "0.5")
    assert(Graph.fmtAxis(3e9) == "3G")
  }

  test("series cycle the default palette; a color tag overrides") {
    val rows = Seq(
      series("a", Seq(1, 2, 3)),
      series("b", Seq(3, 2, 1), tags = Map("color" -> "red")))
    val sc = Graph.scene(rows, Graph.Params())
    val lines = sc.shapes.collect { case l: Graph.PolyLine if l.width > 1.0 => l }
    assert(lines.map(_.rgb) == Seq(0x6464ff, 0xc80032)) // palette blue, tag red
  }

  test("drawAsInfinite tag renders full-height verticals for non-zero points") {
    val rows = Seq(series("m", Seq(0, 1, 0, 1), tags = Map("drawAsInfinite" -> "1")))
    val sc = Graph.scene(rows, Graph.Params())
    val verts = sc.shapes.collect {
      case Graph.PolyLine(Seq((x1, _), (x2, _)), _, _, _, _) if x1 == x2 => x1
    }
    assert(verts.size == 2)
  }

  test("explicit yMin/yMax pin the axis labels") {
    val sc = Graph.scene(Seq(series("m", Seq(10, 20, 30))),
      Graph.Params(yMin = 0, yMax = 100))
    val labels = sc.shapes.collect { case t: Graph.Text => t.s }
    assert(labels.contains("0") && labels.contains("100"))
  }

  test("hideLegend / graphOnly drop the chrome") {
    val rows = Seq(series("m", Seq(1, 2)))
    val full = Graph.scene(rows, Graph.Params())
    val bare = Graph.scene(rows, Graph.Params(graphOnly = true, hideLegend = true))
    assert(full.shapes.count(_.isInstanceOf[Graph.Text]) > 0)
    assert(bare.shapes.count(_.isInstanceOf[Graph.Text]) == 0)
    // still draws the data line + background
    assert(bare.shapes.exists(_.isInstanceOf[Graph.PolyLine]))
  }

  test("NaN gaps split polylines; drawNullAsZero bridges them") {
    val v = Seq(1.0, 2.0, Double.NaN, 3.0, 4.0)
    val gap = Graph.scene(Seq(series("m", v)), Graph.Params(graphOnly = true, hideLegend = true))
    assert(gap.shapes.collect { case l: Graph.PolyLine => l }.size == 2)
    val zero = Graph.scene(Seq(series("m", v)),
      Graph.Params(graphOnly = true, hideLegend = true, drawNullAsZero = true))
    assert(zero.shapes.collect { case l: Graph.PolyLine => l }.size == 1)
  }

  test("confidence-area pair fills one polygon between the curves; invisible base draws nothing") {
    // renderer stack mechanism: invisible stacked base + stacked span —
    // pass the span row FIRST to prove the stack orders the invisible base
    // before it (areaBetween feeds this shape; holtWintersConfidenceArea
    // now carries the RAW bands, so its fill tops at lower+upper exactly
    // like carbonapi's own renderer)
    val span = series("holtWintersConfidenceArea(m)", Seq(2, 2, 2),
      tags = Map("stacked" -> "__DEFAULT__"))
    val base = series("holtWintersConfidenceArea(m)", Seq(1, 1, 1),
      tags = Map("stacked" -> "__DEFAULT__", "invisible" -> "1"))
    val sc = Graph.scene(Seq(span, base),
      Graph.Params(graphOnly = true, hideLegend = true, yMin = 0, yMax = 4))
    val polys = sc.shapes.collect { case pg: Graph.Polygon => pg }
    assert(polys.size == 1)
    assert(sc.shapes.collect { case l: Graph.PolyLine => l }.isEmpty)
    val pts = polys.head.pts
    assert(pts.size == 6)
    val (topY, botY) = (pts.take(3).map(_._2).distinct, pts.drop(3).map(_._2).distinct)
    assert(topY.size == 1 && botY.size == 1)
    assert(topY.head < botY.head) // top = lower+span = upper band, above the base curve
  }

  test("stacked series accumulate and fill; y-range covers the stack total") {
    val rows = Seq(
      series("a", Seq(1, 1), tags = Map("stacked" -> "1")),
      series("b", Seq(2, 2), tags = Map("stacked" -> "1")))
    val sc = Graph.scene(rows, Graph.Params(graphOnly = true, hideLegend = true))
    val polys = sc.shapes.collect { case pg: Graph.Polygon => pg }
    assert(polys.size == 2)
    // the axis labels are hidden (graphOnly), so check geometry: b's top sits
    // above a's top (cumulative 3 vs 1 → smaller pixel y)
    val tops = polys.map(_.pts.take(2).map(_._2).min)
    assert(tops.distinct.size == 2)
  }

  test("areaMode=stacked stacks untagged series; areaAlpha sets the fill alpha") {
    val rows = Seq(series("a", Seq(1, 2)), series("b", Seq(2, 1)))
    val sc = Graph.scene(rows,
      Graph.Params(graphOnly = true, hideLegend = true, areaMode = "stacked", areaAlpha = 0.5))
    val polys = sc.shapes.collect { case pg: Graph.Polygon => pg }
    assert(polys.size == 2)
    assert(polys.forall(_.alpha == 128))
    // plain scene unchanged: no polygons
    val plain = Graph.scene(rows, Graph.Params(graphOnly = true, hideLegend = true))
    assert(plain.shapes.collect { case pg: Graph.Polygon => pg }.isEmpty)
  }

  test("png bytes carry the magic and requested dimensions") {
    val bytes = Graph.png(Seq(series("m", Seq(1, 2, 3))), Graph.Params(width = 123, height = 77))
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'.toByte)
    val w = ((bytes(16) & 0xFF) << 24) | ((bytes(17) & 0xFF) << 16) | ((bytes(18) & 0xFF) << 8) | (bytes(19) & 0xFF)
    val h = ((bytes(20) & 0xFF) << 24) | ((bytes(21) & 0xFF) << 16) | ((bytes(22) & 0xFF) << 8) | (bytes(23) & 0xFF)
    assert(w == 123 && h == 77)
  }

  test("svg renders an empty result as No Data") {
    val s = new String(Graph.svg(Nil, Graph.Params()), "UTF-8")
    assert(s.contains("No Data"))
  }

  test("paramsFrom: template picks params, query overrides, len>10 hides legend") {
    val p = Graph.paramsFrom(Map("template" -> Seq("plain"), "width" -> Seq("500")), nSeries = 2)
    assert(p.bgColor == "white" && p.fgColor == "black" && p.width == 500)
    val many = Graph.paramsFrom(Map.empty, nSeries = 11)
    assert(many.hideLegend)
    val forced = Graph.paramsFrom(Map("hideLegend" -> Seq("false")), nSeries = 11)
    assert(!forced.hideLegend)
  }
}
