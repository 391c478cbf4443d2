package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Kernels, SeriesFrame}

/**
 * Time-manipulation and naming/presentation operators (SURVEY §2.6, §2.8).
 *
 * timeShift/timeStack are FETCH-TIME operators: the compiler evaluates the
 * series argument against a shifted [from,until) (the reference's
 * `Metrics()` adjustment, ref pkg/parser/parser.go:181-219) and this module
 * only re-stamps timestamps — no data movement beyond the shifted scan.
 */
object TimeOps {

  /** Re-stamp a fetched-shifted frame back onto the request range:
    * data was read from [from+offset, until+offset), displayed at ts-offset.
    * (ref timeShift/function.go) */
  /** timeShift: the caller fetched over [from+offs,until+offs); re-stamp
    * start back and, when resetEnd, clamp the shifted tail to the request
    * `until` (graphite-web defaults resetEnd=true, carbonapi false — we
    * follow carbonapi). Name carries the offset seconds and the resetEnd
    * flag (ref timeShift/function.go:73-113). */
  def timeShift(df: DataFrame, offsetSec: Long, resetEnd: Boolean, until: Long): DataFrame = {
    val shifted = df.withColumn("start", col("start") - offsetSec)
    val clamped =
      if (!resetEnd) shifted
      else shifted.withColumn("values",
        slice(col("values"), lit(1),
          greatest(lit(0L), least(size(col("values")).cast("long"),
            floor((lit(until) - col("start")) / col("step")).cast("long"))).cast("int")))
    clamped
      .withColumn("name", concat(lit("timeShift("), col("name"),
        lit(s",'$offsetSec',$resetEnd)")))
      .withColumn("tags", map_concat(
        map_filter(col("tags"), (k, _) => k =!= "timeshift"),
        map(lit("timeshift"), lit(offsetSec.toString))))
  }

  /** timeStack: one shifted copy per unit step in [start,end); each copy is
    * named timeShift(m,unitStr,offsSeconds) with timeShift/timeShiftUnit tags
    * (ref timeStack/function.go:49-67). Caller provides the per-shift
    * evaluated frames. */
  def timeStack(shifted: Seq[(Long, String, DataFrame)]): DataFrame =
    shifted.map { case (offsetSec, unitStr, df) =>
      df.withColumn("start", col("start") - offsetSec)
        .withColumn("name",
          concat(lit("timeShift("), col("name"), lit(s",$unitStr,$offsetSec)")))
        .withColumn("tags", map_concat(
          map_filter(col("tags"), (k, _) => k =!= "timeShift" && k =!= "timeShiftUnit"),
          map(lit("timeShift"), lit(offsetSec.toString), lit("timeShiftUnit"), lit(unitStr))))
    }.reduce(_ unionByName _)

  /** smartSummarize: summarize into buckets anchored at each series' OWN
    * start — the calendar alignment comes from the ADJUSTED FETCH, not a
    * per-series re-anchor (ref smartSummarize/function.go:43-51 moves the
    * request `from` to StartAlignTo(from) before fetching, then the bucket
    * loop at :101-115 walks from arg.StartTime; Eval applies the same
    * pre-fetch alignment, see Eval's smartSummarize case). */
  def smartSummarize(df: DataFrame, interval: Long, func: String, alignTo: String,
                     rawInterval: String = ""): DataFrame = {
    val u = udf((v: Seq[Double], start: Long, step: Long, xf: Double) => {
      val vals = v.toArray
      val stop = start + vals.length * step
      val nOut = math.max(math.ceil((stop - start).toDouble / interval).toInt, 0)
      val out = new Array[Double](nOut)
      var b = 0
      while (b < nOut) {
        val bLo = start + b * interval
        val bHi = bLo + interval
        // ceil((ts-start)/step) index bounds, clamped (ref :104-110)
        val iLo = math.max(((bLo - start + step - 1) / step).toInt, 0)
        val iHi = math.min(math.ceil((bHi - start).toDouble / step).toInt, vals.length)
        val bucket = if (iHi > iLo) java.util.Arrays.copyOfRange(vals, iLo, iHi) else Array.empty[Double]
        // per-series xff gate (ref smartSummarize/function.go:112)
        out(b) = Kernels.summarizeValues(func, bucket, xf.toFloat)
        b += 1
      }
      (start, out)
    })
    df.withColumn("_r", u(col("values"), col("start"), col("step"), SeriesFrame.xffTag))
      .withColumn("start", col("_r._1"))
      .withColumn("values", col("_r._2"))
      .withColumn("step", lit(interval))
      .drop("_r")
      .transform(d => SeriesFrame.rewrap(d, "smartSummarize",
        // reference naming: user's interval string + func, alignTo when given
        // (ref smartSummarize/function.go:84-86)
        Seq(s"'${if (rawInterval.nonEmpty) rawInterval else s"${interval}s"}'", s"'$func'") ++
          (if (alignTo != null && alignTo.nonEmpty) Seq(s"'$alignTo'") else Nil)))
  }

  /** Truncate an epoch-seconds start down to a calendar boundary (UTC). */
  private[engine] def alignStart(start: Long, alignTo: String): Long = {
    if (alignTo == null || alignTo.isEmpty) return start
    // reference StartAlignTo (parser.go:983-1021): strip a leading count
    // ("1hour" → "hour"), then CASE-SENSITIVE prefix match; week REQUIRES a
    // trailing weekday digit (Go convention, Sunday=0 — 'weeks4' = align
    // back to Thursday); anything else is ErrInvalidInterval
    val a = alignTo.replaceFirst("^[0-9]+", "")
    val zdt = java.time.Instant.ofEpochSecond(start).atZone(java.time.ZoneOffset.UTC)
    def day = zdt.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
    val t = a match {
      case s if s.startsWith("y")   => zdt.withDayOfYear(1).toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
      case s if s.startsWith("mon") => zdt.withDayOfMonth(1).toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
      case s if s.startsWith("w") =>
        if (!s.last.isDigit)
          throw new IllegalArgumentException(s"invalid alignTo interval: $alignTo")
        val dow = s.last - '0'
        val startDow = zdt.getDayOfWeek.getValue % 7 // java Mon=1..Sun=7 → Go Sun=0..Sat=6
        // weekday digits 7-9 are accepted and the single +7 correction can
        // leave sub negative (aligning FORWARD) — deliberately identical to
        // the reference's arithmetic (parser.go:1004-1008 adds 7 at most
        // once), not a bug to "fix"
        val sub = { val d = startDow - dow; if (d < 0) d + 7 else d }
        day.minusDays(sub)
      case s if s.startsWith("d")   => day
      case s if s.startsWith("h")   => zdt.withMinute(0).withSecond(0)
      case s if s.startsWith("min") => zdt.withSecond(0)
      case s if s.startsWith("s")   => zdt
      case _ =>
        throw new IllegalArgumentException(s"invalid alignTo interval: $alignTo")
    }
    t.toEpochSecond
  }

  // ------------------------------------------------------------ presentation

  /** substr: slice dot-nodes [start, stop) of the name. (ref substr/function.go) */
  def substr(df: DataFrame, startN: Int, stopN: Int): DataFrame = {
    val u = udf((n: String) => {
      // strip any function wrapping first, like the reference does
      val inner = {
        val lp = n.lastIndexOf('(')
        if (lp >= 0) {
          val rp = n.indexOf(')', lp)
          if (rp > lp) n.substring(lp + 1, rp) else n.substring(lp + 1)
        } else n
      }
      val parts = inner.split(',').head.split('.')
      val s = if (startN < 0) math.max(parts.length + startN, 0) else math.min(startN, parts.length)
      val e = if (stopN == 0) parts.length else if (stopN < 0) parts.length + stopN else math.min(stopN, parts.length)
      parts.slice(s, e).mkString(".")
    })
    df.withColumn("name", u(col("name")))
  }

  /** aliasByTags: rename to selected tag values (node-or-tag addressing).
    * (ref aliasByNode/function.go — shares the implementation) */
  def aliasByTags(df: DataFrame, keys: Seq[String]): DataFrame = {
    // same AggKey as aliasByNode: ints index the wrapper-stripped inner
    // path, anything else reads the tag map (ref aliasByNode/function.go:46)
    val nts: Seq[Either[String, Int]] = keys.map {
      case k if k.nonEmpty && k.forall(c => c.isDigit || c == '-') => Right(k.toInt)
      case tag => Left(tag)
    }
    df.withColumn("name", SeriesOps.nodeOrTagKey(col("name"), col("tags"), nts))
  }

  private val unitSystems: Map[String, Seq[(String, Double)]] = Map(
    "binary" -> Seq("Pi" -> math.pow(1024, 5), "Ti" -> math.pow(1024, 4),
      "Gi" -> math.pow(1024, 3), "Mi" -> math.pow(1024, 2), "Ki" -> 1024.0),
    "si" -> Seq("P" -> 1e15, "T" -> 1e12, "G" -> 1e9, "M" -> 1e6, "K" -> 1e3))

  /** helper.FormatUnits + the legendValue number formatting
    * (ref legendValue/function.go:70-88, helper.go:283-299). */
  private def formatLegend(raw: Double, system: String): String = {
    if (raw.isNaN) return "NaN"
    if (system.isEmpty) return SeriesOps.fmtNum(raw)
    val eps = 1e-11
    val (v, prefix) = unitSystems(system)
      .find { case (_, size) => math.abs(raw) >= size }
      .map { case (p, size) =>
        val v2 = raw / size
        (if (v2 - math.floor(v2) < eps && raw > 1) math.floor(v2) else v2, p)
      }
      .getOrElse((if (raw - math.floor(raw) < eps && raw > 1) math.floor(raw) else raw, ""))
    val pfx = if (prefix.nonEmpty) prefix + " " else ""
    (if (math.abs(v) < 0.1) f"$v%.9g" else f"$v%.2f") + pfx
  }

  /** legendValue: append `(func: value)` per requested function to the name;
    * an `si`/`binary` arg switches every value to unit-prefixed formatting.
    * (ref legendValue/function.go:44-88) */
  def legendValue(df: DataFrame, args: Seq[String]): DataFrame = {
    val system = args.find(a => a == "si" || a == "binary").getOrElse("")
    val funcs = args.filterNot(a => a == "si" || a == "binary")
    val parts: Seq[Column] = funcs.map { f =>
      // per-series xff gate (ref legendValue/function.go:67)
      val su = udf((v: Seq[Double], xf: Double) =>
        Kernels.summarizeValues(f, v.toArray, xf.toFloat))
      val fmtU = udf((raw: Double) => formatLegend(raw, system))
      concat(lit(s" ($f: "), fmtU(su(col("values"), SeriesFrame.xffTag)), lit(")"))
    }
    df.withColumn("name", concat(col("name") +: parts: _*))
  }

  /** humanize.ComputeSI analog: scale into [1, 1000) with an SI prefix. */
  private def computeSI(x: Double): (Double, String) = {
    // humanize.ComputeSI: ±0 normalizes to +0 (no "-0.00"), and an infinite
    // magnitude degrades to NaN (Inf/pow(1000,Inf) = Inf/Inf) — the all-NaN
    // cactiStyle label is "NaN", never "Infinity"
    if (x == 0) return (0.0, "")
    if (x.isNaN || x.isInfinite) return (Double.NaN, "")
    val pos = Seq("", "k", "M", "G", "T", "P", "E", "Z", "Y")
    val neg = Seq("", "m", "µ", "n", "p", "f", "a", "z", "y")
    var v = x; var e = 0
    while (math.abs(v) >= 1000 && e < pos.length - 1) { v /= 1000; e += 1 }
    if (e > 0) return (v, pos(e))
    var d = 0
    while (math.abs(v) < 1 && v != 0 && d < neg.length - 1) { v *= 1000; d += 1 }
    (v, neg(d))
  }

  /** cactiStyle: "name Current:x Max:y Min:z" with the labels of EACH series
    * left-padded to their common width; min/max/current skip NaN, current =
    * last non-NaN; default %.0f formatting, system='si' switches to
    * %.2f+prefix, an optional unit string is appended after a space.
    * (ref cactiStyle/function.go:55-128) */
  def cactiStyle(df: DataFrame, system: String = "", unit: String = ""): DataFrame = {
    val u = udf((n: String, v: Seq[Double]) => {
      var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity; var cur = Double.NegativeInfinity
      v.foreach(x => if (!Kernels.isNaN(x)) { mn = math.min(mn, x); mx = math.max(mx, x); cur = x })
      def fmt(x: Double): String =
        if (system == "si") { val (sv, sp) = computeSI(x); f"$sv%.2f$sp" } else f"$x%.0f"
      def withUnit(s: String) = if (unit.nonEmpty) s + " " + unit else s
      val labels = Map(
        "current" -> ("Current:" + withUnit(fmt(cur))),
        "max" -> ("Max:" + withUnit(fmt(mx))),
        "min" -> ("Min:" + withUnit(fmt(mn))))
      val maxLen = labels.values.map(_.length).max
      def pad(s: String) = " " * (maxLen - s.length) + s
      n + " " + pad(labels("current")) + pad(labels("max")) + pad(labels("min"))
    })
    df.withColumn("name", u(col("name"), col("values")))
  }

  // -------------------------------------------------------------- metadata

  /** The reference's ValidAggregateFunctions for consolidateBy —
    * deliberately narrower than the kernel set ('maximum'/'minimum' are
    * rejected; ref consolidateBy/function.go:29-38). */
  private val validConsolidateBy =
    Set("average", "avg", "max", "min", "sum", "first", "last")

  /** consolidateBy: record the output-consolidation function (used by
    * maxDataPoints rendering; ref consolidateBy/function.go). */
  def consolidateBy(df: DataFrame, func: String): DataFrame = {
    if (!validConsolidateBy.contains(func)) throw new IllegalArgumentException(
      s"consolidateBy: invalid consolidation function: '$func'")
    df.withColumn("tags", map_concat(
        map_filter(col("tags"), (k, _) => k =!= "consolidateBy"),
        map(lit("consolidateBy"), lit(func))))
      // output name ALWAYS double-quotes the function, regardless of the
      // request's quote style, and the tag is the bare name
      // (ref consolidateBy/function.go:59-62)
      .transform(d => SeriesFrame.rewrap(d, "consolidateBy", Seq("\"" + func + "\""), Some(func)))
  }

  /** setXFilesFactor: record xFilesFactor metadata. (ref setXFilesFactor/function.go) */
  def setXFilesFactor(df: DataFrame, xff: Double): DataFrame =
    df.withColumn("tags", map_concat(
      map_filter(col("tags"), (k, _) => k =!= "xFilesFactor"),
      map(lit("xFilesFactor"), lit(xff.toString))))

  /** fallbackSeries: primary if non-empty else fallback. Emptiness is a
    * plan-time action (the reference inspects the fetched list the same way,
    * ref fallbackSeries/function.go). */
  def fallbackSeries(primary: DataFrame, fallback: DataFrame): DataFrame =
    if (primary.isEmpty) fallback else primary
}
