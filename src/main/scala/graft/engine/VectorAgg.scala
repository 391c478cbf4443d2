package graft.engine

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import graft.core.Kernels

case class VecAggInput(start: Long, step: Long, values: Seq[Double])

case class VecAggBuf(
    var start: Long,
    var step: Long, // -1 = empty buffer
    var a: Array[Double],
    var b: Array[Double],
    var cnt: Array[Int],
    var tot: Array[Int])

case class VecAggOutput(start: Long, step: Long, values: Seq[Double])

/**
 * Cross-series point-wise aggregation as a typed Spark `Aggregator`.
 *
 * This is the scale path for `aggregate`/`sumSeries`/`averageSeries`/… :
 * instead of exploding every series into one row per point and shuffling the
 * point cloud, each executor folds whole `values` vectors into a per-group
 * accumulator map-side, so the shuffle carries ONE accumulator array per
 * (group, partition) — ~`step * points` times less data than the exploded
 * equivalent. Decomposable Graphite consolidations only; holistic ones
 * (median/percentile/diff ordering) take the explode path in CombineOps.
 *
 * NaN semantics match the reference kernels
 * (/root/reference/expr/consolidations/consolidations.go:292-445): NaN points
 * are skipped, all-NaN points aggregate to NaN, and the optional xFilesFactor
 * gates each point on the fraction of series that had data there
 * (ref expr/helper/helper.go:151-188).
 *
 * Input series must share a common step (run Align.scaleToCommonStep first);
 * differing starts/lengths are unioned with NaN padding, mirroring
 * `helper.AlignSeries` (ref expr/helper/align.go:243-299).
 */
class VectorAggregator(func: String, xff: Double) extends Aggregator[VecAggInput, VecAggBuf, VecAggOutput] {

  private def initA: Double = func match {
    case "min" | "minimum" => Double.PositiveInfinity
    case "max" | "maximum" | "range" | "rangeOf" | "rangeOf2" => Double.NegativeInfinity
    case "multiply" => 1.0
    case _ => 0.0
  }
  private def initB: Double = func match {
    case "range" | "rangeOf" | "rangeOf2" => Double.PositiveInfinity // b = running min
    case _ => 0.0
  }

  override def zero: VecAggBuf = VecAggBuf(0L, -1L, Array.empty, Array.empty, Array.empty, Array.empty)

  private def ensureRange(buf: VecAggBuf, start: Long, step: Long, n: Int): VecAggBuf = {
    if (buf.step == -1L) {
      val buf2 = VecAggBuf(start, step,
        Array.fill(n)(initA), Array.fill(n)(initB), new Array[Int](n), new Array[Int](n))
      return buf2
    }
    require(buf.step == step, s"VectorAggregator: mixed steps ${buf.step} vs $step — align first")
    val newStart = math.min(buf.start, start)
    val curStop = buf.start + buf.cnt.length.toLong * step
    val newStop = math.max(curStop, start + n.toLong * step)
    if (newStart == buf.start && newStop == curStop) return buf
    val m = ((newStop - newStart) / step).toInt
    val a2 = Array.fill(m)(initA); val b2 = Array.fill(m)(initB)
    val c2 = new Array[Int](m); val t2 = new Array[Int](m)
    val off = ((buf.start - newStart) / step).toInt
    System.arraycopy(buf.a, 0, a2, off, buf.a.length)
    System.arraycopy(buf.b, 0, b2, off, buf.b.length)
    System.arraycopy(buf.cnt, 0, c2, off, buf.cnt.length)
    System.arraycopy(buf.tot, 0, t2, off, buf.tot.length)
    VecAggBuf(newStart, step, a2, b2, c2, t2)
  }

  @inline private def fold(buf: VecAggBuf, idx: Int, x: Double): Unit = {
    buf.tot(idx) += 1
    if (!java.lang.Double.isNaN(x)) {
      buf.cnt(idx) += 1
      func match {
        case "sum" | "total" | "average" | "avg" | "avg_zero" => buf.a(idx) += x
        case "min" | "minimum" => if (x < buf.a(idx)) buf.a(idx) = x
        case "max" | "maximum" => if (x > buf.a(idx)) buf.a(idx) = x
        case "range" | "rangeOf" | "rangeOf2" =>
          if (x > buf.a(idx)) buf.a(idx) = x
          if (x < buf.b(idx)) buf.b(idx) = x
        case "multiply" => buf.a(idx) *= x
        case "stddev" => buf.a(idx) += x; buf.b(idx) += x * x
        case "count" => ()
        case other => throw new IllegalArgumentException(s"VectorAggregator: non-decomposable func $other")
      }
    }
  }

  override def reduce(buf0: VecAggBuf, in: VecAggInput): VecAggBuf = {
    val n = in.values.length
    val buf = ensureRange(buf0, in.start, in.step, n)
    val off = ((in.start - buf.start) / buf.step).toInt
    var i = 0
    while (i < n) { fold(buf, off + i, in.values(i)); i += 1 }
    buf
  }

  override def merge(x0: VecAggBuf, y: VecAggBuf): VecAggBuf = {
    if (y.step == -1L) return x0
    if (x0.step == -1L) return y
    val x = ensureRange(x0, y.start, y.step, y.cnt.length)
    val off = ((y.start - x.start) / x.step).toInt
    var i = 0
    while (i < y.cnt.length) {
      val j = off + i
      x.tot(j) += y.tot(i)
      x.cnt(j) += y.cnt(i)
      func match {
        case "sum" | "total" | "average" | "avg" | "avg_zero" => x.a(j) += y.a(i)
        case "min" | "minimum" => if (y.a(i) < x.a(j)) x.a(j) = y.a(i)
        case "max" | "maximum" => if (y.a(i) > x.a(j)) x.a(j) = y.a(i)
        case "range" | "rangeOf" | "rangeOf2" =>
          if (y.a(i) > x.a(j)) x.a(j) = y.a(i)
          if (y.b(i) < x.b(j)) x.b(j) = y.b(i)
        case "multiply" => x.a(j) *= y.a(i)
        case "stddev" => x.a(j) += y.a(i); x.b(j) += y.b(i)
        case "count" => ()
        case other => throw new IllegalArgumentException(s"VectorAggregator: non-decomposable func $other")
      }
      i += 1
    }
    x
  }

  override def finish(buf: VecAggBuf): VecAggOutput = {
    if (buf.step == -1L) return VecAggOutput(0L, 0L, Seq.empty)
    val n = buf.cnt.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = buf.cnt(i)
      out(i) =
        if (c == 0 || !Kernels.xffOk(c, buf.tot(i), xff)) Double.NaN
        else func match {
          case "sum" | "total" => buf.a(i)
          case "average" | "avg" => buf.a(i) / c
          case "avg_zero" => buf.a(i) / buf.tot(i)
          case "min" | "minimum" | "max" | "maximum" => buf.a(i)
          // multiply aborts to NaN when ANY input point is NaN — the
          // reference never skips NaNs here (ref consolidations.go
          // SummarizeValues "multiply")
          case "multiply" => if (c != buf.tot(i)) Double.NaN else buf.a(i)
          case "range" | "rangeOf" => buf.a(i) - buf.b(i)
          // the standalone rangeOfSeries function NaNs any slot with fewer
          // than two contributing points (ref rangeOfSeries/function.go:69-73)
          case "rangeOf2" => if (c >= 2) buf.a(i) - buf.b(i) else Double.NaN
          case "stddev" =>
            val meanV = buf.a(i) / c
            math.sqrt(math.max(buf.b(i) / c - meanV * meanV, 0.0))
          case "count" => c.toDouble
          case _ => Double.NaN
        }
      i += 1
    }
    VecAggOutput(buf.start, buf.step, out)
  }

  override def bufferEncoder: Encoder[VecAggBuf] = Encoders.product[VecAggBuf]
  override def outputEncoder: Encoder[VecAggOutput] = Encoders.product[VecAggOutput]
}

object VectorAggregator {
  val decomposable: Set[String] = Set(
    "sum", "total", "average", "avg", "avg_zero", "min", "minimum",
    "max", "maximum", "range", "rangeOf", "rangeOf2", "multiply", "stddev", "count")
}
