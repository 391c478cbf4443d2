package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Kernels, VecOps}
import graft.engine.Align

/** Property-based invariants for the consolidation/alignment kernels
  * (SURVEY §5 test strategy: property tests for alignment and
  * consolidation). Plain ScalaCheck generators sampled in a loop — the
  * scalatest-scalacheck bridge artifact isn't on the offline classpath. */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 5) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced/$n")
  }

  private val finiteD = Gen.chooseNum(-1e6, 1e6)
  private val valueG = Gen.frequency(4 -> finiteD, 1 -> Gen.const(Double.NaN))
  private val vecG = Gen.nonEmptyListOf(valueG).map(_.toArray)
  private val denseVecG = Gen.nonEmptyListOf(finiteD).map(_.toArray)

  test("sum/count/min/max/mean consistency under NaN skipping") {
    forSamples(vecG) { v =>
      val nonNaN = v.filter(x => !Kernels.isNaN(x))
      // count of an all-NaN vector is NaN, not 0 (ref consolidations.go:412-426)
      if (nonNaN.isEmpty) assert(Kernels.isNaN(Kernels.count(v)))
      else assert(Kernels.count(v) == nonNaN.length.toDouble)
      if (nonNaN.nonEmpty) {
        assert(math.abs(Kernels.sum(v) - nonNaN.sum) <= 1e-6 * math.max(1, math.abs(nonNaN.sum)))
        assert(Kernels.min(v) == nonNaN.min && Kernels.max(v) == nonNaN.max)
        assert(Kernels.min(v) <= Kernels.mean(v) && Kernels.mean(v) <= Kernels.max(v))
      }
    }
  }

  test("percentile is monotone in p and bounded by min/max") {
    forSamples(for {
      v <- denseVecG; p1 <- Gen.chooseNum(0.0, 100.0); p2 <- Gen.chooseNum(0.0, 100.0)
    } yield (v, p1, p2)) { case (v, p1, p2) =>
      val lo = math.min(p1, p2); val hi = math.max(p1, p2)
      for (interp <- Seq(true, false)) {
        val a = Kernels.percentile(v, lo, interp)
        val b = Kernels.percentile(v, hi, interp)
        assert(a <= b)
        assert(v.min <= a && b <= v.max)
      }
    }
  }

  test("keepLastValue fills every gap after first data; never invents values") {
    forSamples(vecG) { v =>
      val out = VecOps.keepLastValue(v)
      val seen = v.filter(x => !Kernels.isNaN(x)).toSet
      var anyData = false
      v.indices.foreach { i =>
        if (!Kernels.isNaN(v(i))) anyData = true
        if (anyData) assert(!Kernels.isNaN(out(i)) && seen.contains(out(i)))
        else assert(Kernels.isNaN(out(i)))
      }
    }
  }

  test("derivative equals pairwise deltas on dense vectors") {
    forSamples(denseVecG.suchThat(_.length >= 2)) { v =>
      val d = VecOps.derivative(v)
      v.indices.drop(1).foreach { i =>
        assert(math.abs(d(i) - (v(i) - v(i - 1))) < 1e-9)
      }
    }
  }

  test("movingWindow(avg) stays within each source window's min/max") {
    forSamples(for {
      v <- denseVecG.suchThat(_.length >= 3); n <- Gen.chooseNum(1, 5)
    } yield (v, math.min(n, v.length - 1))) { case (v, n) =>
      val out = VecOps.movingWindow(v, n, "average", 0.0)
      out.indices.foreach { j =>
        // output j summarizes trailing source window v[j+1 .. j+n]
        // (first input point skipped, ref moving/function.go:200-250)
        val win = v.slice(j + 1, j + n + 1)
        if (win.nonEmpty && !Kernels.isNaN(out(j))) {
          assert(out(j) >= win.min - 1e-9 && out(j) <= win.max + 1e-9)
        }
      }
    }
  }

  test("lcm divisible by both args") {
    forSamples(for { a <- Gen.chooseNum(1L, 86400L); b <- Gen.chooseNum(1L, 86400L) } yield (a, b)) {
      case (a, b) =>
        val l = Align.lcm(a, b)
        assert(l % a == 0 && l % b == 0 && l > 0)
    }
  }

  test("safeRound is idempotent and within half-step") {
    forSamples(for { v <- finiteD; p <- Gen.chooseNum(0, 6) } yield (v, p)) { case (v, p) =>
      val r = Kernels.safeRound(v, p)
      assert(Kernels.safeRound(r, p) == r)
      assert(math.abs(r - v) <= 0.5 * math.pow(10, -p) + 1e-9)
    }
  }

  test("VectorAggregator is partition-invariant: any split of the series across partial buffers merges to the sequential answer") {
    // the map-side-combine correctness claim behind the 100 TB story: the
    // aggregate of N series must not depend on HOW Spark partitions them
    import graft.engine.{VecAggInput, VectorAggregator}
    val rnd = new scala.util.Random(7)
    val funcs = Seq("sum", "average", "avg_zero", "min", "max", "multiply",
      "range", "rangeOf2", "stddev", "count")
    for (trial <- 1 to 40; func <- funcs) {
      val nSeries = 1 + rnd.nextInt(5)
      val step = 10L
      val series = (1 to nSeries).map { _ =>
        val start = step * rnd.nextInt(4)
        val n = 1 + rnd.nextInt(8)
        val vals = Array.fill(n)(if (rnd.nextInt(4) == 0) Double.NaN else rnd.nextInt(100).toDouble)
        VecAggInput(start, step, vals.toSeq)
      }
      val agg = new VectorAggregator(func, 0.0)
      // sequential: one buffer folds everything in order
      val seqOut = agg.finish(series.foldLeft(agg.zero)(agg.reduce))
      // random split: each partition folds its slice, buffers merge in a
      // shuffled binary tree
      val parts = series.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val bufs = rnd.shuffle(parts.map(p => p.foldLeft(agg.zero)(agg.reduce)))
      val merged = agg.finish(bufs.reduce(agg.merge))
      assert(merged.start == seqOut.start && merged.step == seqOut.step,
        s"$func trial $trial: grid (${merged.start},${merged.step}) vs (${seqOut.start},${seqOut.step})")
      assert(merged.values.length == seqOut.values.length, s"$func trial $trial: lengths")
      merged.values.zip(seqOut.values).zipWithIndex.foreach { case ((m, s), i) =>
        assert((m.isNaN && s.isNaN) || math.abs(m - s) < 1e-9 * math.max(1.0, math.abs(s)),
          s"$func trial $trial [$i]: $m != $s")
      }
    }
  }

  test("parser round-trip: parse(print(parse(t))) == parse(t) over a corpus") {
    val corpus = Seq(
      "a.b.c", "host.*.cpu", "host.{a,b}.cpu[0-9]",
      "sumSeries(events.*)", "movingAverage(sumSeries(a.*),10)",
      "asPercent(a.b,total=sumSeries(a.*))",
      "aliasSub(a.*,'^a\\.(.*)$','x.\\1')",
      "groupByNode(a.*.b,1,'avg')", "scale(offset(a.b,-1),2.5)",
      "timeShift(a.b,'1d')", "summarize(a.b,'1h','sum',true)",
      "seriesByTag('name=~a.*','kind=conv')",
      "a.b | sum | alias('x')",
      "holtWintersConfidenceBands(a.b,4)",
      "divideSeries(a.b,constantLine(10))")
    corpus.foreach { t =>
      val once = graft.parser.Parser.parse(t)
      val twice = graft.parser.Parser.parse(once.print)
      assert(twice == graft.parser.Parser.parse(twice.print), s"not stable: $t")
      assert(once.print == twice.print, s"print not canonical: $t → ${once.print} vs ${twice.print}")
    }
  }
}
