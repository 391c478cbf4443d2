package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Kernels

/**
 * Step/range normalization for cross-series operators (SURVEY §1.3):
 * mixed-step inputs are rebucketed to the LCM of their steps using each
 * series' own consolidation function and xFilesFactor, and all series are
 * NaN-padded onto the common [minStart, maxStop) grid.
 * (ref helper.GetCommonStep + ScaleToCommonStep, expr/helper/align.go:39-156)
 *
 * Fully lazy: the frame-wide stats (step set, range bounds) reduce to ONE
 * broadcast row — no driver action, no shuffle of series data; the rebucket
 * itself is a per-row vector pass.
 */
object Align {

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  def lcm(a: Long, b: Long): Long = if (a == 0 || b == 0) math.max(a, b) else a / gcd(a, b) * b

  /** One series rebucketed onto (cs, alignedStart) with maxVals slots —
    * the per-series body of ScaleToCommonStep (ref align.go:96-141). */
  private[engine] def rebucketOne(v: Seq[Double], start: Long, step: Long, cs: Long,
                                  alignedStart: Long, maxVals: Int,
                                  fn: String, xff: Float): Array[Double] = {
    val out = Array.fill(maxVals)(Double.NaN)
    if (step == cs) {
      val off = ((start - alignedStart) / cs).toInt
      var i = 0
      while (i < v.length && off + i < maxVals) { if (off + i >= 0) out(off + i) = v(i); i += 1 }
    } else {
      val stepFactor = (cs / step).toInt
      val pad = ((start - alignedStart) / step).toInt
      val total = pad + v.length
      val nBuckets = math.min(if (total <= 0) 0 else (1 + (total - 1) / stepFactor), maxVals)
      var b = 0
      while (b < nBuckets) {
        val bucket = new Array[Double](stepFactor)
        var j = 0
        while (j < stepFactor) {
          val src = b * stepFactor + j - pad
          bucket(j) = if (src >= 0 && src < v.length) v(src) else Double.NaN
          j += 1
        }
        out(b) = Kernels.summarizeValues(fn, bucket, xff)
        b += 1
      }
    }
    out
  }

  /** Per-series consolidated length on the (cs, alignedStart) grid. */
  private def consolidatedLen(start: Long, step: Long, n: Int, cs: Long, alignedStart: Long): Int = {
    val padded = ((start - alignedStart) / step) + n
    if (step == cs) padded.toInt else (1 + (padded - 1) * step / cs).toInt
  }

  /** ConsolidateSeriesByStep for a numerator/denominator pair: LCM step,
    * floor-aligned start, both padded to the longer consolidated length.
    * No-op when steps and lengths already agree (ref align.go:382-395). */
  private[engine] def consolidatePair(v1: Seq[Double], start1: Long, step1: Long, fn1: String,
                                      v2: Seq[Double], start2: Long, step2: Long, fn2: String)
      : (Long, Long, Array[Double], Array[Double]) = {
    if (step1 == step2 && v1.length == v2.length && start1 == start2)
      return (start1, step1, v1.toArray, v2.toArray)
    val cs = lcm(step1, step2)
    val minStart = math.min(start1, start2)
    val alignedStart = minStart - math.floorMod(minStart, cs)
    val maxVals = math.max(
      consolidatedLen(start1, step1, v1.length, cs, alignedStart),
      consolidatedLen(start2, step2, v2.length, cs, alignedStart))
    (alignedStart, cs,
      rebucketOne(v1, start1, step1, cs, alignedStart, maxVals, fn1, 0f),
      rebucketOne(v2, start2, step2, cs, alignedStart, maxVals, fn2, 0f))
  }

  /**
   * Rebucket every series to `commonStep` (0 = LCM of observed steps) and
   * pad to the common grid. Uniform-step inputs pass through with only
   * range padding, mirroring `helper.AlignSeries`
   * (ref expr/helper/align.go:243-299).
   */
  def scaleToCommonStep(df: DataFrame, commonStep: Long = 0): DataFrame = {
    val lcmU = udf((steps: Seq[Long]) => steps.filter(_ > 0).reduceOption(lcm).getOrElse(1L))
    val stats = df.agg(
      collect_set(col("step")).as("_steps"),
      min(col("start")).as("_minStart"))
      .select(
        (if (commonStep > 0) lit(commonStep) else lcmU(col("_steps"))).as("_cs"),
        (col("_minStart") - pmod(col("_minStart"), col("_cs"))).as("_as"))
    val withCs = df.crossJoin(broadcast(stats))
    // output length = the longest CONSOLIDATED series, not the common stop
    // bound: same-step series keep front-pad + raw length, rebucketed series
    // take 1+(total-1)/stepFactor — then every series NaN-pads to that max
    // (ref align.go:96-152 maxVals bookkeeping, truncating Go division)
    val padded = floor((col("start") - col("_as")) / col("step")).cast("long") +
      size(col("values")).cast("long")
    val lenCol = when(col("step") === col("_cs"), padded)
      .otherwise(lit(1L) + floor((padded - lit(1L)) * col("step") / col("_cs")).cast("long"))
    val maxVals = withCs.select(lenCol.cast("long").as("_n"))
      .agg(max(col("_n")).as("_maxVals"))
    val rebU = udf((v: Seq[Double], start: Long, step: Long, cs: Long,
                    alignedStart: Long, maxVals: Int, consBy: String, xffS: String) => {
      val xff = try Option(xffS).map(_.toFloat).getOrElse(0f) catch { case _: NumberFormatException => 0f }
      val fn = Option(consBy).map(_.stripPrefix("'").stripSuffix("'")).getOrElse("average")
      val out = Array.fill(maxVals)(Double.NaN)
      if (step == cs) {
        val off = ((start - alignedStart) / cs).toInt
        var i = 0
        while (i < v.length && off + i < maxVals) { if (off + i >= 0) out(off + i) = v(i); i += 1 }
      } else {
        // prefix-pad in source-step units so buckets stay phase-aligned,
        // then collapse stepFactor-sized runs with the series' own
        // consolidation (ref align.go:112-140)
        val stepFactor = (cs / step).toInt
        val pad = ((start - alignedStart) / step).toInt
        val total = pad + v.length
        val nBuckets = math.min(if (total <= 0) 0 else (1 + (total - 1) / stepFactor), maxVals)
        var b = 0
        while (b < nBuckets) {
          val bucket = new Array[Double](stepFactor)
          var j = 0
          while (j < stepFactor) {
            val src = b * stepFactor + j - pad
            bucket(j) = if (src >= 0 && src < v.length) v(src) else Double.NaN
            j += 1
          }
          out(b) = Kernels.summarizeValues(fn, bucket, xff)
          b += 1
        }
      }
      (alignedStart, cs, out)
    })
    withCs.crossJoin(broadcast(maxVals))
      .withColumn("_r", rebU(col("values"), col("start"), col("step"), col("_cs"),
        col("_as"), col("_maxVals").cast("int"),
        element_at(col("tags"), "consolidateBy"), element_at(col("tags"), "xFilesFactor")))
      .withColumn("start", col("_r._1"))
      .withColumn("step", col("_r._2"))
      .withColumn("values", col("_r._3"))
      .drop("_r", "_cs", "_as", "_maxVals", "_steps")
  }
}
