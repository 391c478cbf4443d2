package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Glob, Kernels, VecOps}

/** Kernel semantics mirrored from the reference consolidation tests
  * (/root/reference/expr/consolidations/consolidations.go) — NaN-aware,
  * field-wise with tolerance like tests/compare/compare.go. */
class KernelsSpec extends AnyFunSuite {
  val NaN = Double.NaN
  def eq(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || math.abs(a - b) <= eps
  def assertVec(got: Array[Double], want: Array[Double]): Unit = {
    assert(got.length == want.length, s"length ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(eq(g, w), s"at $i: $g != $w (got ${got.mkString(",")})")
    }
  }

  test("mean skips NaN; all-NaN -> NaN") {
    assert(eq(Kernels.mean(Array(1, 2, NaN, 3)), 2.0))
    assert(Kernels.mean(Array(NaN, NaN)).isNaN)
  }

  test("meanZero divides by full length") {
    assert(eq(Kernels.meanZero(Array(1, 2, NaN, 3)), 1.5))
    assert(Kernels.meanZero(Array(NaN)).isNaN)
  }

  test("sum/max/min/count/range") {
    assert(eq(Kernels.sum(Array(1, 2, NaN)), 3))
    assert(Kernels.sum(Array(NaN)).isNaN)
    assert(eq(Kernels.max(Array(1, NaN, 5)), 5))
    assert(eq(Kernels.min(Array(1, NaN, 5)), 1))
    assert(eq(Kernels.count(Array(1, NaN, 5)), 2))
    assert(eq(Kernels.range(Array(1, NaN, 5)), 4))
  }

  test("diff = first minus rest (NaN-filtered)") {
    assert(eq(Kernels.diff(Array(10, 2, 3)), 5))
    assert(eq(Kernels.diff(Array(NaN, 10, 2)), 8))
    assert(Kernels.diff(Array(NaN, NaN)).isNaN)
  }

  test("last/first") {
    assert(eq(Kernels.last(Array(1, 2, NaN)), 2))
    assert(eq(Kernels.first(Array(3, 2, 1)), 3))
    assert(Kernels.first(Array.empty[Double]).isNaN)
  }

  test("percentile matches graphite interpolation (ref consolidations.go:90-123)") {
    // k = (n-1)*p/100; interpolate: top*rem + secondTop*(1-rem)
    val d = Array(1.0, 2.0, 3.0, 4.0)
    // p50: k=1.5 -> 3*0.5 + 2*0.5 = 2.5
    assert(eq(Kernels.percentile(d.clone(), 50, interpolate = true), 2.5))
    // non-interpolated: ceil(k)=2 -> sorted(2)=3
    assert(eq(Kernels.percentile(d.clone(), 50, interpolate = false), 3.0))
    assert(eq(Kernels.percentile(Array(5.0), 90, interpolate = true), 5.0))
    assert(Kernels.percentile(Array(NaN), 50, interpolate = true).isNaN)
    assert(eq(Kernels.percentile(Array(1.0, NaN, 3.0), 100, interpolate = false), 3.0))
  }

  test("summarizeValues per-function NaN rules") {
    assert(eq(Kernels.summarizeValues("sum", Array(1, 2, NaN)), 3))
    assert(Kernels.summarizeValues("sum", Array(NaN, NaN)).isNaN)
    assert(eq(Kernels.summarizeValues("avg", Array(1, 2, NaN)), 1.5))
    assert(eq(Kernels.summarizeValues("last", Array(1, 2, NaN)), 2))
    assert(Kernels.summarizeValues("multiply", Array(2, 3, NaN)).isNaN)
    assert(eq(Kernels.summarizeValues("multiply", Array(2, 3, 4)), 24))
    assert(eq(Kernels.summarizeValues("median", Array(1, 2, 3, 4)), 2.5))
    assert(eq(Kernels.summarizeValues("p50", Array(1, 2, 3, 4)), 2.5))
    assert(eq(Kernels.summarizeValues("stddev", Array(2, 4, 4, 4, 5, 5, 7, 9)), 2.0))
    // xFilesFactor gate: 2 of 4 non-null = 0.5 < 0.6 -> NaN
    assert(Kernels.summarizeValues("sum", Array(1, NaN, 2, NaN), 0.6f).isNaN)
    assert(eq(Kernels.summarizeValues("sum", Array(1, NaN, 2, NaN), 0.5f), 3))
  }

  test("safeRound uses banker's rounding (ref helper.SafeRound)") {
    assert(Kernels.safeRound(2.5, 0) == 2.0)
    assert(Kernels.safeRound(3.5, 0) == 4.0)
    assert(Kernels.safeRound(2.675, 2) == 2.67 || Kernels.safeRound(2.675, 2) == 2.68) // fp repr
    assert(Kernels.safeRound(NaN, 2).isNaN)
  }

  test("glob to regex") {
    assert("web\\.host-1\\.cpu".r.pattern.pattern() == Glob.toRegex("web.host-1.cpu").drop(1).dropRight(1))
    val m = Glob.matcher("host.*.cpu")
    assert(m("host.a.cpu") && m("host.b-2.cpu") && !m("host.a.b.cpu"))
    val q = Glob.matcher("host?.cpu")
    assert(q("host1.cpu") && !q("host12.cpu"))
    val br = Glob.matcher("host.{a,b}.cpu")
    assert(br("host.a.cpu") && br("host.b.cpu") && !br("host.c.cpu"))
    val cls = Glob.matcher("host[0-3].cpu")
    assert(cls("host2.cpu") && !cls("host5.cpu"))
  }

  test("glob literal prefix (pushdown key)") {
    assert(Glob.literalPrefix("events.*") == "events.")
    assert(Glob.literalPrefix("web.host-{1,2}.cpu") == "web.host-")
    assert(Glob.literalPrefix("*.cpu") == "")
    assert(Glob.literalPrefix("plain.name") == "plain.name")
  }

  test("glob brace expansion (per-branch route pruning key)") {
    assert(Glob.expandBraces("{prod,staging}.web.*") ==
      Some(Seq("prod.web.*", "staging.web.*")))
    // multiple brace groups expand as a cross product
    assert(Glob.expandBraces("{a,b}.x.{1,2}") ==
      Some(Seq("a.x.1", "a.x.2", "b.x.1", "b.x.2")))
    // braceless / unterminated globs pass through as one branch
    assert(Glob.expandBraces("events.*") == Some(Seq("events.*")))
    assert(Glob.expandBraces("ev{ents.*") == Some(Seq("ev{ents.*")))
    // over-cap expansions bail to None (callers fall back to one branch)
    val wide = Seq.fill(4)((1 to 10).mkString("{", ",", "}")).mkString(".")
    assert(Glob.expandBraces(wide, cap = 64).isEmpty)
    // every branch still matches what the original glob matches
    val m = Glob.matcher("{prod,staging}.web.*")
    for (b <- Glob.expandBraces("{prod,staging}.web.*").get)
      assert(m(b.replace("*", "cpu")), s"branch $b must stay inside the glob")
  }

  test("brace-branch prefixes are SOUND pruning keys: every glob match satisfies some branch's literal prefix") {
    // tricky cases on purpose: metachars INSIDE braces are literal to the
    // matcher but wild in the expanded branch, which only ever SHORTENS
    // the branch prefix — pruning stays a superset of the match set
    val globs = Seq(
      "{prod,staging}.web.*", "prod.{web,db}.*", "{a*,b}.c", "{a,b}*",
      "ev{ents,il}.c*", "{x[1-3],y}.m", "host-{1,2}.cpu.{user,sys}")
    val names = Seq(
      "prod.web.cpu", "staging.web.x", "dev.web.cpu", "prod.db.q",
      "a*.c", "ab.c", "b.c", "a1.c", "axx", "b9", "events.click",
      "evil.cpu", "x2.m", "x[1-3].m", "y.m", "host-1.cpu.user",
      "host-2.cpu.sys", "host-3.cpu.user")
    for (g <- globs) {
      val m = Glob.matcher(g)
      val prefixes = Glob.expandBraces(g).getOrElse(Seq(g)).map(Glob.literalPrefix)
      for (n <- names if m(n))
        assert(prefixes.exists(p => p.isEmpty || n.startsWith(p)),
          s"name '$n' matches '$g' but no branch prefix of ${prefixes.mkString("[", ",", "]")} covers it")
    }
  }

  // ---- sequential ops (fixtures mirror reference function_test.go tables)

  test("derivative (ref derivative/function_test.go)") {
    assertVec(VecOps.derivative(Array(2, 4, 6, 1, 4, NaN, 8)),
      Array(NaN, 2, 2, -5, 3, NaN, 4))
  }

  test("nonNegativeDerivative") {
    assertVec(VecOps.nonNegativeDerivative(Array(2, 4, 6, 1, 4, NaN, 8)),
      Array(NaN, 2, 2, NaN, 3, NaN, NaN))
    // counter wrap with maxValue
    assertVec(VecOps.nonNegativeDerivative(Array(0, 1, 2, 3, 4, 5, 0, 1, 2), maxValue = 5),
      Array(NaN, 1, 1, 1, 1, 1, 1, 1, 1))
  }

  test("perSecond") {
    assertVec(VecOps.perSecond(Array(0.0, 60, 120), 60), Array(NaN, 1, 1))
  }

  test("integral NaN passthrough") {
    assertVec(VecOps.integral(Array(1, 2, NaN, 3)), Array(1, 3, NaN, 6))
  }

  test("keepLastValue with limit (partial prefix fill, ref keepLastValue/function.go:66-84)") {
    assertVec(VecOps.keepLastValue(Array(1, NaN, NaN, 4), Double.PositiveInfinity),
      Array(1, 1, 1, 4))
    assertVec(VecOps.keepLastValue(Array(1, NaN, NaN, 4), 1),
      Array(1, 1, NaN, 4)) // gap of 2, limit 1 → first point fills
    assertVec(VecOps.keepLastValue(Array(NaN, 2, NaN, NaN), 2),
      Array(NaN, 2, 2, 2)) // leading gap not filled; trailing within limit
    // the reference golden: limit 3 over a 4-gap fills exactly 3
    assertVec(VecOps.keepLastValue(Array(NaN, 2, NaN, NaN, NaN, NaN, 4, 5), 3),
      Array(NaN, 2, 2, 2, 2, NaN, 4, 5))
    assertVec(VecOps.keepLastValue(Array(1, NaN, NaN), -1),
      Array(1, 1, 1)) // negative limit = unlimited
  }

  test("interpolate linear fill") {
    assertVec(VecOps.interpolate(Array(1, NaN, NaN, 4)), Array(1, 2, 3, 4))
    assertVec(VecOps.interpolate(Array(NaN, 2, NaN, 4)), Array(NaN, 2, 3, 4))
  }

  test("changed") {
    assertVec(VecOps.changed(Array(1, 1, 2, NaN, 2, 3)), Array(0, 0, 1, 0, 0, 1))
  }

  test("delay shifts with NaN padding") {
    assertVec(VecOps.delay(Array(1, 2, 3), 1), Array(NaN, 1, 2))
    assertVec(VecOps.delay(Array(1, 2, 3), -1), Array(2, 3, NaN))
  }

  test("movingWindow trailing n-point semantics (ref moving/function.go:209-250)") {
    // n=2 over [1,2,3,4]: output len 2; out[0] = agg(v[1..2]), out[1] = agg(v[2..3])
    assertVec(VecOps.movingWindow(Array(1, 2, 3, 4), 2, "average", 0), Array(2.5, 3.5))
    assertVec(VecOps.movingWindow(Array(1, 2, 3, 4), 2, "sum", 0), Array(5, 7))
    // all-NaN window -> NaN
    assertVec(VecOps.movingWindow(Array(1, NaN, NaN, 4), 2, "average", 0), Array(NaN, 4))
  }

  test("ema seeds with mean of first window") {
    val out = VecOps.ema(Array(2.0, 2.0, 2.0, 2.0), 2)
    // seed = mean(2,2)=2; alpha=2/3; stays 2
    assertVec(out, Array(2, 2, 2, 2))
  }

  test("linFit") {
    val (slope, icept) = VecOps.linFit(Array(1, 3, 5, 7))
    assert(eq(slope, 2) && eq(icept, 1))
  }

  test("pearson") {
    assert(eq(VecOps.pearson(Array(1, 2, 3), Array(2, 4, 6)), 1.0))
    assert(eq(VecOps.pearson(Array(1, 2, 3), Array(6, 4, 2)), -1.0))
  }

  test("fft roundtrip") {
    val re = Array(1.0, 2.0, 3.0, 4.0)
    val im = new Array[Double](4)
    VecOps.fftInPlace(re, im)
    // DC component = sum
    assert(eq(re(0), 10.0))
    // inverse: conj -> fft -> conj / n
    var i = 0
    while (i < 4) { im(i) = -im(i); i += 1 }
    VecOps.fftInPlace(re, im)
    assertVec(re.map(_ / 4), Array(1, 2, 3, 4))
  }

  test("the reference TestSummarizeValues table verbatim (ref consolidations/consolidations_test.go:10-146)") {
    val NaN = Double.NaN
    val cases: Seq[(String, Array[Double], Float, Double)] = Seq(
      ("sum", Array[Double](), 0f, NaN),
      ("sum", Array[Double](1, 2, 3), 0f, 6),
      ("total", Array[Double](1, 2, 3), 0f, 6),
      ("avg", Array[Double](1, 2, 3, 4), 0f, 2.5),
      ("avg", Array(1, 2, 3, 4, NaN), 0f, 2.5),
      ("avg", Array(1, 2, 3, 4, NaN), 0.9f, NaN),
      ("max", Array[Double](1, 2, 3, 4), 0f, 4),
      ("min", Array[Double](1, 2, 3, 4), 0f, 1),
      ("last", Array[Double](1, 2, 3, 4), 0f, 4),
      ("range", Array[Double](1, 2, 3, 4), 0f, 3),
      ("median", Array[Double](1, 2, 3, 10, 11), 0f, 3),
      ("multiply", Array[Double](1, 2, 3, 4), 0f, 24),
      ("diff", Array[Double](1, 2, 3, 4), 0f, -8),
      ("count", Array[Double](1, 2, 3, 4), 0f, 4),
      ("stddev", Array[Double](1, 2, 3, 4), 0f, 1.118033988749895),
      ("p50", Array[Double](1, 2, 3, 10, 11), 0f, 3),
      ("sum", Array(NaN, NaN, NaN, NaN), 0f, NaN),
      ("sum", Array[Double](0, 0, 0, 0, 0), 0f, 0))
    for ((fn, vals, xff, want) <- cases) {
      val got = Kernels.summarizeValues(fn, vals, xff)
      assert((got.isNaN && want.isNaN) || math.abs(got - want) < 1e-12,
        s"summarizeValues($fn, ${vals.mkString(",")}, $xff) = $got, want $want")
    }
  }
}
