package graft.api

import graft.core.Kernels

/**
 * format=png / format=svg rendering, pure JVM (Java2D + hand-emitted SVG —
 * the reference links cairo; we depend on nothing outside the JDK).
 *
 * Geometry is computed once into a tiny scene model and rendered by two
 * backends, so PNG and SVG are pixel-for-pixel the same layout and the
 * scene itself is unit-testable without decoding an image.
 *
 * Parameter surface and defaults mirror the reference's PictureParams
 * (ref expr/functions/cairo/png/picture_params.go:209-307,362-432): the
 * `template=` render param picks a params template, explicit query params
 * override it, and per-series `color`/`drawAsInfinite`/`dashed` tags
 * recorded by the graph-option setter functions are honored.
 */
object Graph {

  // BufferedImage rendering needs no display; force headless before any
  // AWT class loads so servers without an X display can serve PNGs
  System.setProperty("java.awt.headless", "true")

  // ---------------------------------------------------------------- params

  /** Subset of the reference's PictureParams that affects layout/drawing.
    * (ref picture_params.go:119-207) */
  case class Params(
      width: Int = 330,
      height: Int = 250,
      margin: Int = 10,
      fgColor: String = "white",
      bgColor: String = "black",
      majorLine: String = "rose",
      minorLine: String = "grey",
      fontSize: Double = 10,
      graphOnly: Boolean = false,
      hideLegend: Boolean = false,
      hideGrid: Boolean = false,
      hideAxes: Boolean = false,
      hideYAxis: Boolean = false,
      hideXAxis: Boolean = false,
      title: String = "",
      lineWidth: Double = 1.2,
      lineMode: String = "slope", // slope | staircase | connected
      connectedLimit: Int = Int.MaxValue,
      colorList: Seq[String] = DefaultColorList,
      yMin: Double = Double.NaN,
      yMax: Double = Double.NaN,
      drawNullAsZero: Boolean = false,
      areaMode: String = "none", // none | first | all | stacked
      areaAlpha: Double = Double.NaN,
      tz: java.time.ZoneId = java.time.ZoneOffset.UTC)

  /** Default series color rotation (ref picture_params.go:15). */
  val DefaultColorList: Seq[String] =
    Seq("blue", "green", "red", "purple", "brown", "yellow", "aqua", "grey",
      "magenta", "pink", "gold", "rose")

  /** Built-in templates; `template=<name>` falls back to default when
    * unknown, matching the reference (ref picture_params.go:214-218).
    * `plain` mirrors graphite-web's light theme. */
  val templates: Map[String, Params] = Map(
    "default" -> Params(),
    "plain" -> Params(fgColor = "black", bgColor = "white"),
    "dark" -> Params())

  /** Build Params from /render query params + template, with the
    * reference's len>10 default for hideLegend. */
  def paramsFrom(p: Map[String, Seq[String]], nSeries: Int): Params = {
    def one(k: String): Option[String] = p.get(k).flatMap(_.headOption).filter(_.nonEmpty)
    def num(k: String, d: Double): Double = one(k).flatMap(_.toDoubleOption).getOrElse(d)
    def int(k: String, d: Int): Int = one(k).flatMap(_.toDoubleOption).map(_.toInt).getOrElse(d)
    def bool(k: String, d: Boolean): Boolean =
      one(k).map(v => v == "true" || v == "1" || v == "yes").getOrElse(d)
    val t = templates.getOrElse(one("template").getOrElse("default"), templates("default"))
    // pixelRatio scales the whole surface (ref pixel_ratio.go)
    val pr = math.max(0.1, num("pixelRatio", 1.0))
    t.copy(
      width = (int("width", t.width) * pr).toInt,
      height = (int("height", t.height) * pr).toInt,
      margin = (int("margin", t.margin) * pr).toInt,
      fgColor = one("fgcolor").getOrElse(t.fgColor),
      bgColor = one("bgcolor").getOrElse(t.bgColor),
      majorLine = one("majorLine").getOrElse(t.majorLine),
      minorLine = one("minorLine").getOrElse(t.minorLine),
      fontSize = num("fontSize", t.fontSize) * pr,
      graphOnly = bool("graphOnly", t.graphOnly),
      hideLegend = bool("hideLegend", nSeries > 10),
      hideGrid = bool("hideGrid", t.hideGrid),
      hideAxes = bool("hideAxes", t.hideAxes),
      hideYAxis = bool("hideYAxis", t.hideYAxis),
      hideXAxis = bool("hideXAxis", t.hideXAxis),
      title = one("title").getOrElse(t.title),
      lineWidth = num("lineWidth", t.lineWidth) * pr,
      lineMode = one("lineMode").getOrElse(t.lineMode),
      connectedLimit = int("connectedLimit", t.connectedLimit),
      colorList = one("colorList").map(_.split(',').map(_.trim).toSeq).getOrElse(t.colorList),
      yMin = num("yMin", t.yMin),
      yMax = num("yMax", t.yMax),
      drawNullAsZero = bool("drawNullAsZero", t.drawNullAsZero),
      areaMode = one("areaMode").getOrElse(t.areaMode),
      areaAlpha = num("areaAlpha", t.areaAlpha))
  }

  // ---------------------------------------------------------------- colors

  /** Graphite color names (ref png/graphutil.go:108-140 core table) plus
    * hex forms RGB / RRGGBB / RRGGBBAA. */
  private val namedColors: Map[String, Int] = Map(
    "black" -> 0x000000, "white" -> 0xffffff, "blue" -> 0x6464ff,
    "green" -> 0x00c800, "red" -> 0xc80032, "yellow" -> 0xffff00,
    "orange" -> 0xffa500, "purple" -> 0xc864ff, "brown" -> 0x966432,
    "cyan" -> 0x00ffff, "aqua" -> 0x009696, "gray" -> 0xafafaf,
    "grey" -> 0xafafaf, "magenta" -> 0xff00ff, "pink" -> 0xff6464,
    "gold" -> 0xc8c800, "rose" -> 0xc896c8, "darkblue" -> 0x0000ff,
    "darkgreen" -> 0x00ff00, "darkred" -> 0xff0000, "darkgray" -> 0x6f6f6f,
    "darkgrey" -> 0x6f6f6f, "navy" -> 0x000080, "teal" -> 0x008080,
    "lime" -> 0x00ff00, "violet" -> 0xee82ee, "olive" -> 0x808000,
    "maroon" -> 0x800000, "silver" -> 0xc0c0c0)

  /** Resolve to (rgb, alpha 0-255). Unknown names render as grey, like a
    * dashboard would rather than 500ing. */
  def color(s: String): (Int, Int) = {
    val c = s.trim.stripPrefix("#").toLowerCase
    namedColors.get(c).map((_, 0xff)).getOrElse {
      if (c.matches("[0-9a-f]{3}")) {
        val Seq(r, g, b) = c.map(h => Integer.parseInt(h.toString, 16) * 17).toSeq
        ((r << 16) | (g << 8) | b, 0xff)
      } else if (c.matches("[0-9a-f]{6}")) (Integer.parseInt(c, 16), 0xff)
      else if (c.matches("[0-9a-f]{8}"))
        (Integer.parseInt(c.take(6), 16), Integer.parseInt(c.drop(6), 16))
      else (namedColors("grey"), 0xff)
    }
  }

  // ----------------------------------------------------------------- scene

  sealed trait Shape
  case class Rect(x: Double, y: Double, w: Double, h: Double, rgb: Int, alpha: Int) extends Shape
  case class PolyLine(pts: Seq[(Double, Double)], rgb: Int, alpha: Int, width: Double,
                      dashed: Boolean) extends Shape
  /** Closed filled region — stacked / area-mode series fills. */
  case class Polygon(pts: Seq[(Double, Double)], rgb: Int, alpha: Int) extends Shape
  case class Text(x: Double, y: Double, s: String, rgb: Int, size: Double,
                  anchor: String) extends Shape // anchor: start | middle | end

  case class Scene(width: Int, height: Int, shapes: Seq[Shape])

  /** SI-ish axis label (ref png/cairo.go makeLabel / yUnitSystem si). */
  def fmtAxis(v: Double): String = {
    val a = math.abs(v)
    def trim(x: Double): String =
      if (x == math.rint(x) && a < 1e15) x.toLong.toString
      else BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.stripTrailingZeros.toPlainString
    if (a >= 1e12) trim(v / 1e12) + "T" else if (a >= 1e9) trim(v / 1e9) + "G"
    else if (a >= 1e6) trim(v / 1e6) + "M" else if (a >= 1e3) trim(v / 1e3) + "K"
    else trim(v)
  }

  /** Largest "pretty" step (1/2/2.5/5 × 10^k) giving ≤ maxTicks divisions. */
  private def niceStep(span: Double, maxTicks: Int): Double = {
    if (span <= 0 || span.isNaN || span.isInfinite) return 1.0
    val rough = span / math.max(1, maxTicks)
    val mag = math.pow(10, math.floor(math.log10(rough)))
    Seq(1.0, 2.0, 2.5, 5.0, 10.0).map(_ * mag).find(_ >= rough).getOrElse(10 * mag)
  }

  /** Compute the full scene for a series list: background, grid, axes,
    * series lines, legend. All later pixels derive from here. */
  def scene(rows: Seq[RenderedSeries], p: Params): Scene = {
    val (fg, _) = color(p.fgColor)
    val (bg, _) = color(p.bgColor)
    val shapes = Seq.newBuilder[Shape]
    shapes += Rect(0, 0, p.width, p.height, bg, 0xff)

    val fs = p.fontSize
    // legend cells size to the longest name (~0.62em per char + swatch)
    val legendCellW =
      if (rows.isEmpty) 0.0
      else math.min(p.width.toDouble,
        rows.map(_.name.length).max * fs * 0.62 + fs * 2.5)
    val legendPerRow = math.max(1, (p.width / math.max(1.0, legendCellW)).toInt)
    val legendRows =
      if (p.hideLegend || p.graphOnly || rows.isEmpty) 0
      else math.ceil(rows.size.toDouble / legendPerRow).toInt
    val topPad = p.margin + (if (p.title.nonEmpty && !p.graphOnly) fs * 1.8 else 0)
    val bottomPad = p.margin +
      (if (p.graphOnly || p.hideAxes || p.hideXAxis) 0.0 else fs * 1.6) +
      legendRows * fs * 1.5
    val leftPad = p.margin +
      (if (p.graphOnly || p.hideAxes || p.hideYAxis) 0.0 else fs * 4.5)
    val x0 = leftPad; val y0 = topPad
    val x1 = p.width - p.margin.toDouble; val y1 = p.height - bottomPad
    val plotW = math.max(1.0, x1 - x0); val plotH = math.max(1.0, y1 - y0)

    if (rows.isEmpty) {
      shapes += Text(p.width / 2.0, p.height / 2.0, "No Data", fg, fs * 1.4, "middle")
      return Scene(p.width, p.height, shapes.result())
    }

    // ---- stacking pre-pass (ref cairo.go:1182-1243): stacked series become
    // cumulative within their stack; each remembers its base curve so the
    // draw step can fill base→top. The `stacked` tag carries the stack name
    // ("1" = legacy default), `invisible` consumes stack space drawing
    // nothing (areaBetween / holtWintersConfidenceArea lower band).
    val DefaultStack = "__DEFAULT__"
    def tagStack(r: RenderedSeries): Option[String] =
      r.tags.get("stacked").map(v => if (v == "1") DefaultStack else v)
    def isInfinite(r: RenderedSeries): Boolean = r.tags.contains("drawAsInfinite")

    var hasStack = rows.exists(r => tagStack(r).isDefined)
    val assigned: Seq[Option[String]] = p.areaMode match {
      case "stacked" => hasStack = true; rows.map(_ => Some("stack"))
      case "first"   => rows.zipWithIndex.map { case (r, i) => if (i == 0) Some("") else tagStack(r) }
      case "all"     => rows.map(_ => Some(""))
      case _         => rows.map(tagStack)
    }
    case class PRow(r: RenderedSeries, stack: Option[String], invisible: Boolean,
                    vals: Array[Double], base: Array[Double])
    var prows = rows.zip(assigned).map { case (r, sn) =>
      PRow(r, sn, r.tags.contains("invisible"), r.values.clone(),
        new Array[Double](r.values.length))
    }
    if (hasStack) {
      // stacked rows first, grouped by stack name; within a stack the
      // invisible base accumulates first — the reference relies on stable
      // list order (cairo.go:2726-2732 ByStacked) which Spark result rows
      // don't have, so the tie-break is explicit
      prows = prows.sortBy(pr => (pr.stack.isEmpty, pr.stack.getOrElse(""), !pr.invisible))
      val total = scala.collection.mutable.ArrayBuffer.empty[Double]
      var cur = prows.head.stack.getOrElse("")
      var ended = false
      prows.foreach { pr =>
        if (!ended && !isInfinite(pr.r)) {
          if (pr.stack.isEmpty) ended = true
          else {
            if (pr.stack.get != cur) { total.clear(); cur = pr.stack.get }
            var i = 0
            while (i < pr.vals.length) {
              if (total.length <= i) total += 0.0
              pr.base(i) = total(i)
              val v = pr.vals(i)
              if (!Kernels.isNaN(v)) { pr.vals(i) = v + total(i); total(i) += v }
              i += 1
            }
          }
        }
      }
    }

    val tMin = rows.map(_.start).min.toDouble
    val tMax = rows.map(_.stop).max.toDouble
    // y-bounds from post-stacking values, like the reference (stacking
    // rewrites r.Values before axis setup)
    val finite = prows.flatMap(_.vals.filterNot(v => Kernels.isNaN(v) || v.isInfinite))
    val (dMin, dMax) = if (finite.isEmpty) (0.0, 1.0) else (finite.min, finite.max)
    val loRaw = if (p.yMin.isNaN) math.min(dMin, if (p.drawNullAsZero) 0.0 else dMin) else p.yMin
    val hiRaw = if (p.yMax.isNaN) dMax else p.yMax
    val step = niceStep(hiRaw - loRaw, 5)
    val lo = if (p.yMin.isNaN) math.floor(loRaw / step) * step else loRaw
    val hi0 = if (p.yMax.isNaN) math.ceil(hiRaw / step) * step else hiRaw
    val hi = if (hi0 > lo) hi0 else lo + step

    def xPix(t: Double): Double = x0 + (t - tMin) / math.max(1.0, tMax - tMin) * plotW
    def yPix(v: Double): Double = y1 - (v - lo) / (hi - lo) * plotH

    // grid + y labels
    if (!p.graphOnly) {
      val (majorRgb, _) = color(p.majorLine)
      var tick = lo
      while (tick <= hi + step * 1e-9) {
        val y = yPix(tick)
        if (!p.hideGrid && !p.hideAxes)
          shapes += PolyLine(Seq((x0, y), (x1, y)), majorRgb, 0x40, 0.5, dashed = true)
        if (!p.hideAxes && !p.hideYAxis)
          shapes += Text(x0 - 4, y + fs * 0.35, fmtAxis(tick), fg, fs, "end")
        tick += step
      }
      // x labels: ~5 time ticks, HH:mm for <2d ranges else MM/dd
      if (!p.hideAxes && !p.hideXAxis) {
        val span = tMax - tMin
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern(if (span <= 2 * 86400) "HH:mm" else "MM/dd").withZone(p.tz)
        (0 to 4).foreach { i =>
          val t = tMin + span * i / 4
          shapes += Text(xPix(t), y1 + fs * 1.3, fmt.format(java.time.Instant.ofEpochSecond(t.toLong)),
            fg, fs, if (i == 0) "start" else if (i == 4) "end" else "middle")
        }
      }
      // frame
      if (!p.hideAxes)
        shapes += PolyLine(Seq((x0, y0), (x0, y1), (x1, y1)), fg, 0xff, 1.0, dashed = false)
      if (p.title.nonEmpty)
        shapes += Text(p.width / 2.0, p.margin + fs, p.title, fg, fs * 1.2, "middle")
    }

    // series
    def clampY(y: Double): Double = math.min(math.max(y, y0), y1)
    prows.zipWithIndex.foreach { case (pr, i) =>
      val r = pr.r
      val cname = r.tags.getOrElse("color", p.colorList(i % p.colorList.size))
      val (rgb, alpha0) = color(cname)
      // per-series alpha() setter overrides the color's alpha (ref HasAlpha)
      val alpha = r.tags.get("alpha").flatMap(_.toDoubleOption)
        .map(a => math.min(255, math.max(0, (a * 255).round.toInt))).getOrElse(alpha0)
      val dashed = r.tags.get("dashed").exists(_ != "0")
      val infinite = isInfinite(r)
      val stacked = pr.stack.isDefined && !infinite
      if (infinite) {
        // non-zero points draw as full-height vertical lines
        // (ref cairo.go drawAsInfinite handling)
        r.values.zipWithIndex.foreach { case (v, j) =>
          if (!Kernels.isNaN(v) && v > 0) {
            val x = xPix(r.start + j * r.step.toDouble)
            shapes += PolyLine(Seq((x, y0), (x, y1)), rgb, alpha, p.lineWidth, dashed)
          }
        }
      } else if (stacked) {
        // filled area between the base curve (stack below) and this series'
        // cumulative top, one polygon per non-NaN run; invisible rows only
        // consumed stack space (ref cairo.go:2309,2400-2412 fillAreaAndClip)
        if (!pr.invisible) {
          val fillAlpha =
            if (!p.areaAlpha.isNaN) math.min(255, math.max(0, (p.areaAlpha * 255).round.toInt))
            else alpha
          def at(j: Int): Double = {
            val v = pr.vals(j)
            if (p.drawNullAsZero && Kernels.isNaN(v)) pr.base(j) else v
          }
          var j = 0
          while (j < pr.vals.length) {
            if (Kernels.isNaN(at(j)) || at(j).isInfinite) j += 1
            else {
              var k = j
              while (k < pr.vals.length && !Kernels.isNaN(at(k)) && !at(k).isInfinite) k += 1
              if (k - j >= 2) {
                val top = (j until k).map { m =>
                  (xPix(r.start + m * r.step.toDouble), clampY(yPix(at(m)))) }
                val bot = (j until k).reverse.map { m =>
                  (xPix(r.start + m * r.step.toDouble), clampY(yPix(pr.base(m)))) }
                shapes += Polygon(top ++ bot, rgb, fillAlpha)
              }
              j = k
            }
          }
        }
      } else {
        // split into runs at NaN gaps (connected mode bridges gaps up to
        // connectedLimit missing points; drawNullAsZero replaces them)
        var run = List.newBuilder[(Double, Double)]
        var runLen = 0
        var gap = 0
        var lastY = Double.NaN
        def flush(): Unit = {
          val pts = run.result()
          if (pts.length > 1) shapes += PolyLine(pts, rgb, alpha, p.lineWidth, dashed)
          run = List.newBuilder; runLen = 0
        }
        r.values.zipWithIndex.foreach { case (v0, j) =>
          val v = if (p.drawNullAsZero && Kernels.isNaN(v0)) 0.0 else v0
          if (Kernels.isNaN(v) || v.isInfinite) {
            gap += 1
            if (p.lineMode != "connected" || gap > p.connectedLimit) flush()
          } else {
            gap = 0
            val x = xPix(r.start + j * r.step.toDouble)
            // staircase: horizontal to the new x at the old level, then drop
            if (p.lineMode == "staircase" && runLen > 0) run += ((x, lastY))
            lastY = yPix(v)
            run += ((x, lastY)); runLen += 1
          }
        }
        flush()
      }
    }

    // legend
    if (legendRows > 0) {
      prows.map(_.r).zipWithIndex.foreach { case (r, i) =>
        val cname = r.tags.getOrElse("color", p.colorList(i % p.colorList.size))
        val (rgb, alpha) = color(cname)
        val row = i / legendPerRow; val colI = i % legendPerRow
        val ly = y1 + fs * 1.6 + (if (!p.hideAxes && !p.hideXAxis) fs * 1.2 else 0) + row * fs * 1.5
        val lx = colI * legendCellW + 4
        shapes += Rect(lx, ly - fs * 0.8, fs, fs * 0.8, rgb, alpha)
        shapes += Text(lx + fs * 1.4, ly, trimTo(r.name, (legendCellW / (fs * 0.62)).toInt - 2), fg, fs, "start")
      }
    }
    Scene(p.width, p.height, shapes.result())
  }

  private case class Scene0(shapes: Seq[Shape])
  private def trimTo(s: String, n: Int): String = if (n > 3 && s.length > n) s.take(n - 1) + "…" else s

  // ------------------------------------------------------------------ png

  def png(rows: Seq[RenderedSeries], p: Params): Array[Byte] = {
    val sc = scene(rows, p)
    val img = new java.awt.image.BufferedImage(sc.width, sc.height,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    try {
      import java.awt.{BasicStroke, Color, Font, RenderingHints}
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      sc.shapes.foreach {
        case Rect(x, y, w, h, rgb, a) =>
          g.setColor(new Color((a << 24) | (rgb & 0xffffff), true))
          g.fillRect(x.toInt, y.toInt, math.ceil(w).toInt, math.ceil(h).toInt)
        case Polygon(pts, rgb, a) =>
          g.setColor(new Color((a << 24) | (rgb & 0xffffff), true))
          val path = new java.awt.geom.Path2D.Double()
          pts.headOption.foreach { case (x, y) => path.moveTo(x, y) }
          pts.drop(1).foreach { case (x, y) => path.lineTo(x, y) }
          path.closePath()
          g.fill(path)
        case PolyLine(pts, rgb, a, w, dashed) =>
          g.setColor(new Color((a << 24) | (rgb & 0xffffff), true))
          g.setStroke(if (dashed)
            new BasicStroke(w.toFloat, BasicStroke.CAP_BUTT, BasicStroke.JOIN_ROUND, 1f, Array(4f, 4f), 0f)
          else new BasicStroke(w.toFloat, BasicStroke.CAP_ROUND, BasicStroke.JOIN_ROUND))
          val path = new java.awt.geom.Path2D.Double()
          pts.headOption.foreach { case (x, y) => path.moveTo(x, y) }
          pts.drop(1).foreach { case (x, y) => path.lineTo(x, y) }
          g.draw(path)
        case Text(x, y, s, rgb, size, anchor) =>
          g.setColor(new Color(0xff000000 | (rgb & 0xffffff), true))
          g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, math.round(size).toInt))
          val fm = g.getFontMetrics
          val dx = anchor match {
            case "middle" => -fm.stringWidth(s) / 2.0
            case "end" => -fm.stringWidth(s).toDouble
            case _ => 0.0
          }
          g.drawString(s, (x + dx).toFloat, y.toFloat)
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------ svg

  private def hex(rgb: Int): String = f"#${rgb & 0xffffff}%06x"
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  def svg(rows: Seq[RenderedSeries], p: Params): Array[Byte] = {
    val sc = scene(rows, p)
    val sb = new StringBuilder
    sb ++= s"""<?xml version="1.0" encoding="UTF-8"?>\n"""
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${sc.width}" height="${sc.height}" viewBox="0 0 ${sc.width} ${sc.height}">\n"""
    sc.shapes.foreach {
      case Rect(x, y, w, h, rgb, a) =>
        sb ++= f"""<rect x="$x%.1f" y="$y%.1f" width="$w%.1f" height="$h%.1f" fill="${hex(rgb)}" fill-opacity="${a / 255.0}%.3f"/>\n"""
      case Polygon(pts, rgb, a) =>
        val d = pts.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
        sb ++= f"""<polygon points="$d" fill="${hex(rgb)}" fill-opacity="${a / 255.0}%.3f"/>\n"""
      case PolyLine(pts, rgb, a, w, dashed) =>
        val d = pts.map { case (x, y) => f"$x%.1f,$y%.1f" }.mkString(" ")
        val dash = if (dashed) """ stroke-dasharray="4,4"""" else ""
        sb ++= f"""<polyline points="$d" fill="none" stroke="${hex(rgb)}" stroke-opacity="${a / 255.0}%.3f" stroke-width="$w%.1f"$dash/>\n"""
      case Text(x, y, s, rgb, size, anchor) =>
        val ta = anchor match { case "start" => "start"; case "end" => "end"; case _ => "middle" }
        sb ++= f"""<text x="$x%.1f" y="$y%.1f" fill="${hex(rgb)}" font-family="sans-serif" font-size="$size%.1f" text-anchor="$ta">${esc(s)}</text>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
}
