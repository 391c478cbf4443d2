package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parser._

/** Grammar cases mirrored from the reference parser tests
  * (/root/reference/pkg/parser/parser_test.go). */
class ParserSpec extends AnyFunSuite {

  test("bare metric name") {
    assert(Parser.parse("foo.bar.baz") == NameExpr("foo.bar.baz"))
  }

  test("glob names keep metacharacters") {
    assert(Parser.parse("host.*.cpu") == NameExpr("host.*.cpu"))
    assert(Parser.parse("host.{a,b}.cpu-[0-9]") == NameExpr("host.{a,b}.cpu-[0-9]"))
  }

  test("simple function call") {
    assert(Parser.parse("sum(foo.bar)") == FuncCall("sum", Seq(NameExpr("foo.bar")), Map.empty, "foo.bar"))
  }

  test("nested calls, numbers, strings, bools") {
    val e = Parser.parse("movingAverage(scale(a.b, -2.5), '1h', true)")
    assert(e == FuncCall("movingAverage", Seq(
      FuncCall("scale", Seq(NameExpr("a.b"), Num(-2.5)), Map.empty, "a.b, -2.5"),
      Str("1h"), BoolLit(true)), Map.empty, "scale(a.b, -2.5), '1h', true"))
  }

  test("named args") {
    val e = Parser.parse("aggregate(a.*, 'sum', xFilesFactor=0.5)")
    assert(e == FuncCall("aggregate", Seq(NameExpr("a.*"), Str("sum")),
      Map("xFilesFactor" -> Num(0.5)), "a.*, 'sum', xFilesFactor=0.5"))
  }

  test("pipe syntax folds into nested calls (ref parser.go:676-698)") {
    val e = Parser.parse("a.b | sum | aliasByNode(1)")
    assert(e == FuncCall("aliasByNode", Seq(
      FuncCall("sum", Seq(NameExpr("a.b")), Map.empty), Num(1)), Map.empty))
  }

  test("seriesByTag stays opaque (ref parser.go:639-643)") {
    val e = Parser.parse("seriesByTag('tag2=value*', 'name=~{0,1}')")
    assert(e == NameExpr("seriesByTag('tag2=value*', 'name=~{0,1}')"))
  }

  test("integer vs name disambiguation") {
    assert(Parser.parse("groupByNode(a.*, 1, 'sum')") ==
      FuncCall("groupByNode", Seq(NameExpr("a.*"), Num(1), Str("sum")), Map.empty, "a.*, 1, 'sum'"))
    assert(Parser.parse("1xx.count") == NameExpr("1xx.count"))
  }

  test("negative node indices") {
    assert(Parser.parse("aliasByNode(a.b.c, -1)") ==
      FuncCall("aliasByNode", Seq(NameExpr("a.b.c"), Num(-1)), Map.empty, "a.b.c, -1"))
  }

  test("print reconstructs canonical form") {
    assert(Parser.parse("sumSeries(events.*)").asInstanceOf[FuncCall].rawArgs == "events.*")
    val f = Parser.parse("scale(a.b,2.5)").asInstanceOf[FuncCall]
    assert(f.print == "scale(a.b,2.5)")
    assert(f.rawArgs == "a.b,2.5")
  }

  test("define macros expand at parse time (ref pkg/parser/define.go)") {
    try {
      Defines.define("perMinute", "scaleToSeconds({{.argString}},60)")
      val e = Defines.expand(Parser.parse("perMinute(events.*)"))
      assert(e.print == "scaleToSeconds(events.*,60)")
      Defines.define("firstArg", "absolute({{index .args 0}})")
      assert(Defines.expand(Parser.parse("firstArg(a.b,9)")).print == "absolute(a.b)")
      Defines.define("kw", "offset({{.kwargs.series}},1)")
      assert(Defines.expand(Parser.parse("kw(series=a.b)")).print == "offset(a.b,1)")
      // nested inside other calls, and macro-in-macro
      Defines.define("pm2", "perMinute({{.argString}})")
      assert(Defines.expand(Parser.parse("sumSeries(pm2(x.y))")).print ==
        "sumSeries(scaleToSeconds(x.y,60))")
    } finally Defines.clear()
  }

  test("interval parsing (ref pkg/parser/interval.go)") {
    assert(Interval.parse("1h") == 3600)
    assert(Interval.parse("-1d") == -86400)
    assert(Interval.parse("2min") == 120)
    assert(Interval.parse("1h30min") == 5400)
    assert(Interval.parse("1w") == 604800)
    assert(Interval.parse("10s") == 10)
    assert(Interval.parse("1mon") == 2592000)
    assert(Interval.parse("30", defaultSign = -1) == -30)
  }
}
