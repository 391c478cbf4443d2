package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Series
import graft.engine.{Align, SeriesOps}

/** Mixed-step alignment + aggregation over a real (local) session — the
  * one behavior the uniform-step fixture store can't exercise.
  *
  * Coverage note: the reference's AlignSeries tables (ref
  * expr/helper/align_test.go) mutate per-series StartTimes in place as an
  * aggregation PRE-pass; that intermediate state is not observable here —
  * its observable (the aggregated grid incl. the maxVals bookkeeping) is
  * asserted by the aggregate tables in FixtureSpec and the
  * ScaleToCommonStep tables below, which exercise the same grid math. */
class AlignSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.core.GraftSession.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def frame(series: Series*) = {
    val sp = spark
    import sp.implicits._
    series.toSeq.toDF()
  }

  test("lcm") {
    assert(Align.lcm(10, 60) == 60)
    assert(Align.lcm(15, 10) == 30)
  }

  test("mixed steps rebucket to LCM with avg consolidation (ref align.go:76-156)") {
    val fine = Series("a", Map("name" -> "a"), 0L, 10L, Array(1, 2, 3, 4, 5, 6).map(_.toDouble))
    val coarse = Series("b", Map("name" -> "b"), 0L, 30L, Array(10.0, 20.0))
    val out = Align.scaleToCommonStep(frame(fine, coarse))
      .orderBy("name").collect()
    assert(out.forall(_.getAs[Long]("step") == 30L))
    val a = out(0).getAs[scala.collection.Seq[Double]]("values")
    assert(a == Seq(2.0, 5.0)) // avg(1,2,3), avg(4,5,6)
    val b = out(1).getAs[scala.collection.Seq[Double]]("values")
    assert(b == Seq(10.0, 20.0))
  }

  test("misaligned starts NaN-pad onto the common grid (ref AlignSeries align.go:243-299)") {
    val early = Series("a", Map("name" -> "a"), 0L, 10L, Array(1.0, 2.0))
    val late = Series("b", Map("name" -> "b"), 20L, 10L, Array(9.0))
    val out = Align.scaleToCommonStep(frame(early, late)).orderBy("name").collect()
    assert(out.forall(r => r.getAs[Long]("start") == 0L))
    val b = out(1).getAs[scala.collection.Seq[Double]]("values")
    assert(b.length == 3 && b(0).isNaN && b(1).isNaN && b(2) == 9.0)
  }

  test("consolidateBy tag drives the rebucket function (ref aggregateBatch align.go:176-189)") {
    val s = Series("a", Map("name" -> "a", "consolidateBy" -> "max"), 0L, 10L,
      Array(1.0, 5.0, 3.0))
    val other = Series("b", Map("name" -> "b"), 0L, 30L, Array(0.0))
    val out = Align.scaleToCommonStep(frame(s, other)).orderBy("name").collect()
    assert(out(0).getAs[scala.collection.Seq[Double]]("values") == Seq(5.0))
  }

  test("the reference TestScaleToCommonStep tables (ref expr/helper/helper_test.go:126-225)") {
    val NaN = Double.NaN
    def checkAligned(commonStep: Long, in: Seq[Series], want: Map[String, (Long, Long, Seq[Double])]): Unit = {
      val out = Align.scaleToCommonStep(frame(in: _*), commonStep).collect()
        .map(r => r.getAs[String]("name") ->
          ((r.getAs[Long]("start"), r.getAs[Long]("step"), r.getAs[scala.collection.Seq[Double]]("values").toSeq)))
        .toMap
      assert(out.keySet == want.keySet)
      for ((n, (ws, wst, wv)) <- want) {
        val (gs, gst, gv) = out(n)
        assert(gs == ws && gst == wst, s"$n: start/step ($gs,$gst) want ($ws,$wst)")
        assert(gv.length == wv.length, s"$n: ${gv.length} points ($gv), want ${wv.length}")
        gv.zip(wv).zipWithIndex.foreach { case ((g, w), i) =>
          assert((g.isNaN && w.isNaN) || math.abs(g - w) < 1e-9, s"$n[$i]: $g != $w") }
      }
    }
    // Normal metrics: LCM step 6, starts floor to the grid, avg consolidation
    checkAligned(0, Seq(
      Series("metric1", Map("name" -> "metric1"), 4L, 1L, Array(1, 3, 5, 7, 9, 11, 13, 15, 17).map(_.toDouble)),
      Series("metric2", Map("name" -> "metric2"), 4L, 2L, Array(1, 2, 3, 4, 5).map(_.toDouble)),
      Series("metric3", Map("name" -> "metric3"), 3L, 3L, Array(1, 2, 3, 4, 5, 6).map(_.toDouble))),
      Map(
        "metric1" -> ((0L, 6L, Seq(2, 10, 17, NaN))),
        "metric2" -> ((0L, 6L, Seq(1, 3, 5, NaN))),
        "metric3" -> ((0L, 6L, Seq(1, 2.5, 4.5, 6)))))
    // per-series consolidation + xFilesFactor against FULL bucket slots
    checkAligned(0, Seq(
      Series("metric1", Map("name" -> "metric1", "consolidateBy" -> "sum", "xFilesFactor" -> "0.45"),
        3L, 1L, Array(NaN, 3, 5, 7, 9, 11, 13, 15, 17)),
      Series("metric2", Map("name" -> "metric2", "consolidateBy" -> "min", "xFilesFactor" -> "0.45"),
        4L, 2L, Array(1, 2, 3, 4, 5).map(_.toDouble)),
      Series("metric3", Map("name" -> "metric3", "consolidateBy" -> "max", "xFilesFactor" -> "0.51"),
        3L, 3L, Array(1, 2, 3, 4, 5, 6).map(_.toDouble)),
      Series("metric6", Map("name" -> "metric6"), 0L, 6L, Array(1, 2, 3, 4, 5).map(_.toDouble))),
      Map(
        "metric1" -> ((0L, 6L, Seq(NaN, 72, NaN, NaN, NaN))),
        "metric2" -> ((0L, 6L, Seq(NaN, 2, NaN, NaN, NaN))),
        "metric3" -> ((0L, 6L, Seq(NaN, 3, 5, NaN, NaN))),
        "metric6" -> ((0L, 6L, Seq(1, 2, 3, 4, 5)))))
    // explicit common step 12
    checkAligned(12, Seq(
      Series("metric1", Map("name" -> "metric1"), 3L, 1L, Array(NaN, 3, 5, 7, 9, 11, 13, 15, 17)),
      Series("metric2", Map("name" -> "metric2"), 4L, 2L, Array(1, 2, 3, 4, 5).map(_.toDouble)),
      Series("metric3", Map("name" -> "metric3"), 3L, 3L, Array(1, 2, 3, 4, 5, 6).map(_.toDouble)),
      Series("metric6", Map("name" -> "metric6"), 0L, 6L, Array(1, 2, 3, 4, 5).map(_.toDouble))),
      Map(
        "metric1" -> ((0L, 12L, Seq(10, NaN, NaN))),
        "metric2" -> ((0L, 12L, Seq(2.5, 5, NaN))),
        "metric3" -> ((0L, 12L, Seq(2, 5, NaN))),
        "metric6" -> ((0L, 12L, Seq(1.5, 3.5, 5)))))
  }

  test("common tags survive aggregation as the per-key intersection (ref expr/helper/helper_test.go TestGetCommonTags)") {
    val out = SeriesOps.aggregateNamed(frame(
      Series("seriesByTag('tag1=value1')", Map("name" -> "m1", "tag1" -> "value1", "tag2" -> "onevalue", "tag3" -> "value3"), 0L, 1L, Array(1.0)),
      Series("seriesByTag('tag1=value1')", Map("name" -> "m2", "tag1" -> "value1", "tag2" -> "differentvalue", "tag4" -> "value4"), 0L, 1L, Array(2.0))),
      "sum", "seriesByTag('tag1=value1')").collect()
    assert(out.length == 1)
    val tags = out(0).getAs[Map[String, String]]("tags")
    assert(tags.get("tag1").contains("value1"))
    assert(!tags.contains("tag2") && !tags.contains("tag3") && !tags.contains("tag4"))
  }

  test("sumSeries over mixed steps folds on the aligned grid") {
    val fine = Series("a", Map("name" -> "a"), 0L, 10L, Array(1, 2, 3, 4, 5, 6).map(_.toDouble))
    val coarse = Series("b", Map("name" -> "b"), 0L, 30L, Array(10.0, 20.0))
    val out = SeriesOps.aggregateNamed(frame(fine, coarse), "sum", "a,b", align = true).collect()
    assert(out.length == 1)
    assert(out(0).getAs[scala.collection.Seq[Double]]("values") == Seq(12.0, 25.0))
  }

  test("window functions widen the FETCH range before plan construction " +
      "(the reference's expr.Metrics() pre-pass, ref pkg/parser/parser.go:155-330)") {
    // a recording store proves the scan request itself moved back — the
    // scale contract is that widening reaches partition pruning, not a
    // post-scan re-read
    val calls = scala.collection.mutable.Buffer.empty[(String, Long, Long)]
    val store = new graft.store.SeriesStore {
      override def stepHint: Option[Long] = Some(60L)
      override def fetch(s: SparkSession, path: String, from: Long, until: Long) = {
        calls += ((path, from, until))
        graft.engine.Eval.emptyFrame(s)
          .withColumn("pathExpression", org.apache.spark.sql.functions.lit(path))
      }
      override def fetchAll(s: SparkSession, from: Long, until: Long) =
        graft.engine.Eval.emptyFrame(s)
    }
    val from = 100000L; val until = 120000L
    graft.engine.Eval.evalTarget(spark, store, "movingAverage(m,'1h')", from, until)
    assert(calls.exists { case (p, f, _) => p == "m" && f == from - 3600 },
      s"movingAverage must fetch 1h earlier, got $calls")

    calls.clear()
    graft.engine.Eval.evalTarget(spark, store, "movingSum(m,30)", from, until)
    assert(calls.exists { case (p, f, _) => p == "m" && f == from - 30 * 60 },
      s"point-count windows widen by n*step (stepHint), got $calls")

    calls.clear()
    graft.engine.Eval.evalTarget(spark, store, "exponentialMovingAverage(m,'30min')", from, until)
    assert(calls.exists { case (p, f, _) => p == "m" && f < from },
      s"ema must widen its fetch, got $calls")

    // holtWinters bootstraps a full season of history (ref holtwinters
    // Metrics() widening: -7d)
    calls.clear()
    graft.engine.Eval.evalTarget(spark, store, "holtWintersForecast(m)", from, until)
    assert(calls.exists { case (p, f, _) => p == "m" && f <= from - 7 * 86400 },
      s"holtWintersForecast must fetch a season of bootstrap, got $calls")

    // timeShift fetches the SHIFTED window, same length ('1d' defaults to
    // the past like the reference's -1 sign)
    calls.clear()
    graft.engine.Eval.evalTarget(spark, store, "timeShift(m,'1d')", from, until)
    assert(calls.exists { case (p, f, u) =>
      p == "m" && f == from - 86400 && u == until - 86400 },
      s"timeShift must fetch the shifted window, got $calls")
  }

  test("highest drains descending, lowest ascending, and the order survives the marshal tier " +
      "(ref highestLowest/function.go:126-146 heap fill; ordered table function_test.go:187-200)") {
    val df = frame(
      Series("a", Map("name" -> "a"), 0L, 10L, Array(1.0, 1.0)),
      Series("b", Map("name" -> "b"), 0L, 10L, Array(9.0, 9.0)),
      Series("c", Map("name" -> "c"), 0L, 10L, Array(5.0, 5.0)))
    val hi = graft.api.Render.collect(SeriesOps.highest(df, 2, "max")).map(_.name)
    assert(hi == Seq("b", "c"), s"top-2 descending, got $hi") // results[len(mh)] fill
    val lo = graft.api.Render.collect(SeriesOps.lowest(df, 2, "max")).map(_.name)
    assert(lo == Seq("a", "c"), s"bottom-2 ascending, got $lo")
  }
}
