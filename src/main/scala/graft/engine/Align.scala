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
      min(col("start")).as("_minStart"),
      max(col("start") + size(col("values")).cast("long") * col("step")).as("_maxStop"))
      .select(
        (if (commonStep > 0) lit(commonStep) else lcmU(col("_steps"))).as("_cs"),
        col("_minStart"), col("_maxStop"))
    val rebU = udf((v: Seq[Double], start: Long, step: Long, cs: Long,
                    minStart: Long, maxStop: Long, consBy: String, xffS: String) => {
      val alignedStart = minStart - math.floorMod(minStart, cs)
      val nOut = math.max(math.ceil((maxStop - alignedStart).toDouble / cs).toInt, 0)
      val xff = try Option(xffS).map(_.toFloat).getOrElse(0f) catch { case _: NumberFormatException => 0f }
      val fn = Option(consBy).map(_.stripPrefix("'").stripSuffix("'")).getOrElse("average")
      val out = Array.fill(nOut)(Double.NaN)
      if (step == cs) {
        val off = ((start - alignedStart) / cs).toInt
        var i = 0
        while (i < v.length && off + i < nOut) { if (off + i >= 0) out(off + i) = v(i); i += 1 }
      } else {
        // prefix-pad in source-step units so buckets stay phase-aligned,
        // then collapse stepFactor-sized runs with the series' own
        // consolidation (ref align.go:112-140)
        val stepFactor = (cs / step).toInt
        val pad = ((start - alignedStart) / step).toInt
        val total = pad + v.length
        val nBuckets = math.min((total + stepFactor - 1) / stepFactor, nOut)
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
    df.crossJoin(broadcast(stats))
      .withColumn("_r", rebU(col("values"), col("start"), col("step"), col("_cs"),
        col("_minStart"), col("_maxStop"),
        element_at(col("tags"), "consolidateBy"), element_at(col("tags"), "xFilesFactor")))
      .withColumn("start", col("_r._1"))
      .withColumn("step", col("_r._2"))
      .withColumn("values", col("_r._3"))
      .drop("_r", "_cs", "_minStart", "_maxStop", "_steps")
  }
}
