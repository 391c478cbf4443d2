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

  test("define expansion: the reference TestDefineExpand table (ref pkg/parser/define_test.go)") {
    try {
      Defines.define("constMetric", "metric.name")
      Defines.define("perMinute", "perSecond({{.argString}})|scale(60)")
      Defines.define("funcAlias", "funcOrig({{index .args 0}},{{index .args 1}})")
      Defines.define("funcAlias2", "funcOrig2({{index .args 0}},{{index .kwargs \"key\"}})")
      Defines.define("object", "object.*.*.{{index .args 0}}")
      def x(s: String): String = Defines.expand(Parser.parse(s)).print
      assert(x("func1(metric1,func2(metricA, metricB),metric3)") ==
        "func1(metric1,func2(metricA,metricB),metric3)")
      assert(x("func1(metric1,constMetric(metricA, metricB),metric3)") ==
        "func1(metric1,metric.name,metric3)")
      // pipe template folds into nested calls
      assert(x("func1(metric1,perMinute(metricA),metric3)") ==
        "func1(metric1,scale(perSecond(metricA),60),metric3)")
      assert(x("funcAlias(metricA,metricB)") == "funcOrig(metricA,metricB)")
      assert(x("funcAlias2(metricA,key=\"42\")") == "funcOrig2(metricA,'42')")
      assert(x("object(9554433)") == "object.*.*.9554433")
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
    assert(Interval.parse("1hr") == 3600)
    assert(Interval.parse("2wks") == 1209600)
    // strict grammar: empty, bare signs, missing digits, unitless numbers
    // all error (ref interval.go:12-18, Atoi("") failure, empty-unit default)
    for (bad <- Seq("", "-", "+", "-s1", "30", "1x"))
      assertThrows[IllegalArgumentException](Interval.parse(bad))
  }

  // ---- reference TestParseExpr corpus, ported case by case
  // (ref pkg/parser/parser_test.go:42-525). Structural equality on our AST;
  // rawArgs asserted where the reference pins argString on a direct call
  // (piped forms synthesize calls, so raw falls back to canonical print).

  test("corpus: names, unicode, trailing '=', metachars (ref parser_test.go:55-70,312-340,425)") {
    assert(Parser.parse("metric=") == NameExpr("metric="))
    assert(Parser.parse("métric.ñame") == NameExpr("métric.ñame"))
    assert(Parser.parse("metric") == NameExpr("metric"))
    assert(Parser.parse("metric.foo") == NameExpr("metric.foo"))
    assert(Parser.parse("metric.*.foo") == NameExpr("metric.*.foo"))
    assert(Parser.parse("foo.{bar,baz}.qux") == NameExpr("foo.{bar,baz}.qux"))
    assert(Parser.parse("foo.b[0-9].qux") == NameExpr("foo.b[0-9].qux"))
    assert(Parser.parse("foo.b[0-9]+.qux") == NameExpr("foo.b[0-9]+.qux"))
    assert(Parser.parse("virt.v1.*.text-match:<foo.bar.qux>") ==
      NameExpr("virt.v1.*.text-match:<foo.bar.qux>"))
    assert(Parser.parse("hello&world") == NameExpr("hello&world"))
  }

  test("corpus: calls, nesting, argString capture (ref parser_test.go:71-106,441-450)") {
    assert(Parser.parse("func(metric)") ==
      FuncCall("func", Seq(NameExpr("metric")), Map.empty, "metric"))
    assert(Parser.parse("func(metric1,metric2,metric3)") ==
      FuncCall("func", Seq(NameExpr("metric1"), NameExpr("metric2"), NameExpr("metric3")),
        Map.empty, "metric1,metric2,metric3"))
    assert(Parser.parse("func1(metric1,func2(metricA, metricB),metric3)") ==
      FuncCall("func1", Seq(
        NameExpr("metric1"),
        FuncCall("func2", Seq(NameExpr("metricA"), NameExpr("metricB")), Map.empty, "metricA, metricB"),
        NameExpr("metric3")), Map.empty, "metric1,func2(metricA, metricB),metric3"))
    assert(Parser.parse("func1(\"example blah\")") ==
      FuncCall("func1", Seq(Str("example blah")), Map.empty, "\"example blah\""))
  }

  test("corpus: numeric constants incl. scientific notation (ref parser_test.go:107-125)") {
    assert(Parser.parse("3") == Num(3))
    assert(Parser.parse("3.1") == Num(3.1))
    assert(Parser.parse("func1(metric1, 3, 1e2, 2e-3)") ==
      FuncCall("func1", Seq(NameExpr("metric1"), Num(3), Num(100), Num(0.002)),
        Map.empty, "metric1, 3, 1e2, 2e-3"))
    assert(Parser.parse("func1(metric1, -3)") ==
      FuncCall("func1", Seq(NameExpr("metric1"), Num(-3)), Map.empty, "metric1, -3"))
    assert(Parser.parse("func1(metric1, -3 , 'foo' )") ==
      FuncCall("func1", Seq(NameExpr("metric1"), Num(-3), Str("foo")),
        Map.empty, "metric1, -3 , 'foo' "))
  }

  test("corpus: string args in both quote styles (ref parser_test.go:126-148)") {
    assert(Parser.parse("func1(metric1, 'stringconst')") ==
      FuncCall("func1", Seq(NameExpr("metric1"), Str("stringconst")),
        Map.empty, "metric1, 'stringconst'"))
    assert(Parser.parse("func1(metric1, \"stringconst\")") ==
      FuncCall("func1", Seq(NameExpr("metric1"), Str("stringconst")),
        Map.empty, "metric1, \"stringconst\""))
  }

  test("corpus: named args in every position and type (ref parser_test.go:162-310)") {
    assert(Parser.parse("func(metric, key='value')") ==
      FuncCall("func", Seq(NameExpr("metric")), Map("key" -> Str("value")),
        "metric, key='value'"))
    assert(Parser.parse("func(metric, key=true)") ==
      FuncCall("func", Seq(NameExpr("metric")), Map("key" -> BoolLit(true)),
        "metric, key=true"))
    assert(Parser.parse("func(metric, key=1)") ==
      FuncCall("func", Seq(NameExpr("metric")), Map("key" -> Num(1)), "metric, key=1"))
    assert(Parser.parse("func(metric, key=0.1)") ==
      FuncCall("func", Seq(NameExpr("metric")), Map("key" -> Num(0.1)), "metric, key=0.1"))
    assert(Parser.parse("func(metric, 1, key='value')") ==
      FuncCall("func", Seq(NameExpr("metric"), Num(1)), Map("key" -> Str("value")),
        "metric, 1, key='value'"))
    assert(Parser.parse("func(metric, key='value', 1)") ==
      FuncCall("func", Seq(NameExpr("metric"), Num(1)), Map("key" -> Str("value")),
        "metric, key='value', 1"))
    assert(Parser.parse("func(metric, key1='value1', key2='value2')") ==
      FuncCall("func", Seq(NameExpr("metric")),
        Map("key1" -> Str("value1"), "key2" -> Str("value2")),
        "metric, key1='value1', key2='value2'"))
    assert(Parser.parse("func(metric, key2='value2', key1='value1')") ==
      FuncCall("func", Seq(NameExpr("metric")),
        Map("key1" -> Str("value1"), "key2" -> Str("value2")),
        "metric, key2='value2', key1='value1'"))
  }

  test("corpus: pipes fold argument-first, in any mix (ref parser_test.go:341-424,506-524)") {
    val inner = FuncCall("func2", Seq(NameExpr("metricA"), NameExpr("metricB")),
      Map.empty, "metricA, metricB")
    assert(Parser.parse("func2(metricA, metricB)|func1(metric1,metric3)") ==
      FuncCall("func1", Seq(inner, NameExpr("metric1"), NameExpr("metric3")), Map.empty))
    val abn = FuncCall("aliasByNode",
      Seq(NameExpr("company.server*.applicationInstance.requestsHandled"), Num(1)), Map.empty)
    val want = FuncCall("movingAverage", Seq(abn, Str("5min")), Map.empty)
    assert(Parser.parse(
      "company.server*.applicationInstance.requestsHandled|aliasByNode(1)|movingAverage(\"5min\")")
      == want)
    assert(Parser.parse(
      "aliasByNode(company.server*.applicationInstance.requestsHandled,1)|movingAverage(\"5min\")")
      == FuncCall("movingAverage", Seq(
        FuncCall("aliasByNode",
          Seq(NameExpr("company.server*.applicationInstance.requestsHandled"), Num(1)),
          Map.empty, "company.server*.applicationInstance.requestsHandled,1"),
        Str("5min")), Map.empty))
    assert(Parser.parse("company.server*.applicationInstance.requestsHandled|keepLastValue()") ==
      FuncCall("keepLastValue",
        Seq(NameExpr("company.server*.applicationInstance.requestsHandled")), Map.empty))
    // multiline pipe chain
    assert(Parser.parse("func1(foo.bar)\n| func2(foo.baz)|\n func3(\n\tfunc4(asdf.zxcv.qwer)\n)") ==
      FuncCall("func3", Seq(
        FuncCall("func2", Seq(
          FuncCall("func1", Seq(NameExpr("foo.bar")), Map.empty, "foo.bar"),
          NameExpr("foo.baz")), Map.empty),
        FuncCall("func4", Seq(NameExpr("asdf.zxcv.qwer")), Map.empty, "asdf.zxcv.qwer")),
        Map.empty))
  }

  test("corpus: whitespace and newline tolerance (ref parser_test.go:426-505)") {
    // reference ParseExpr returns (expr, remainder); parsePrefix is our twin
    val (e1, rem1) = Parser.parsePrefix("foo.bar\n.baz\t")
    assert(e1 == NameExpr("foo.bar") && rem1.contains(".baz"))
    assert(Parser.parse("absolute( baz )\n") ==
      FuncCall("absolute", Seq(NameExpr("baz")), Map.empty, " baz "))
    assert(Parser.parse("func(metric, true\n)") ==
      FuncCall("func", Seq(NameExpr("metric"), BoolLit(true)), Map.empty, "metric, true\n"))
    assert(Parser.parse("foobar(\n)") == FuncCall("foobar", Seq.empty, Map.empty))
    assert(Parser.parse("foobar(asdf,\n\tzxcv,\n\tqwer\n)") ==
      FuncCall("foobar", Seq(NameExpr("asdf"), NameExpr("zxcv"), NameExpr("qwer")),
        Map.empty, "asdf,\n\tzxcv,\n\tqwer\n"))
  }

  test("interval grammar: the reference TestInterval table incl. the int32 range bound (ref pkg/parser/interval_test.go)") {
    val ok = Seq(
      ("1s", 1, 1L), ("2d", 1, 2L * 86400), ("10hours", 1, 10L * 3600),
      ("7d13h45min21s", 1, 7L * 86400 + 13 * 3600 + 45 * 60 + 21),
      ("01hours", 1, 3600L), ("2d2d", 1, 4L * 86400),
      ("1s", -1, -1L), ("10m10s", 1, 610L), ("+2d", -1, 2L * 86400),
      ("-10hours", -1, -10L * 3600), ("-360h2min", -1, -360L * 3600 - 120),
      ("68y", 1, 68L * 365 * 86400),
      ("1hr", 1, 3600L), ("2hrs", 1, 7200L), ("1wk", 1, 604800L),
      ("2wks", 1, 2L * 604800), ("1yr", 1, 365L * 86400), ("2yrs", 1, 2L * 365 * 86400),
      ("1hr30min", 1, 5400L))
    for ((s, sign, want) <- ok)
      assert(Interval.parse(s, sign) == want, s"Interval.parse($s, $sign)")
    // the int32 result bound and unit errors (interval.go:75-78)
    for (bad <- Seq("", "-", "+", "10x10s", "1" + "0" * 100 + "y", "100y", "-100y", "69y"))
      assertThrows[IllegalArgumentException](Interval.parse(bad, 1))
  }

  test("name extraction: the reference TestExtractName/TestExtractNameTag tables (ref expr/types/extract_test.go)") {
    val common = Seq(
      "f" -> "f",
      "func(f)" -> "f",
      "foo.bar.baz" -> "foo.bar.baz",
      "nonNegativeDerivative(foo.bar.baz)" -> "foo.bar.baz",
      "movingAverage(foo.bar.baz,10)" -> "foo.bar.baz",
      "scale(scaleToSeconds(nonNegativeDerivative(foo.bar.baz),60),60)" -> "foo.bar.baz",
      "divideSeries(foo.bar.baz,baz.qux.zot)" -> "foo.bar.baz",
      "{something}" -> "{something}",
      "ab=" -> "ab=",
      "ab=.c" -> "ab=.c",
      "ab==" -> "ab==",
      "scale(scaleToSeconds(nonNegativeDerivative(ab==.c),60),60)" -> "ab==.c",
      "divideSeries(metric[12])" -> "metric[12]",
      "average(metric{1,2}e,'sum')" -> "metric{1,2}e",
      "aliasByNode(alias(0.1.2.@.4, 2), 1)" -> "0.1.2.@.4",
      "aliasByTags(alias(0.1.2.@.4, 2), 1)" -> "0.1.2.@.4",
      "alias(Количество изменений)" -> "Количество изменений",
      "some(Количество изменений, Аргумент)" -> "Количество изменений",
      "seriesByTag('tag2=value*', 'name=metric')" -> "seriesByTag('tag2=value*', 'name=metric')",
      "sum(seriesByTag('tag2=value*', 'name=metric'))" -> "seriesByTag('tag2=value*', 'name=metric')")
    for ((in, want) <- common) {
      assert(graft.core.Names.extractName(in) == want, s"extractName($in)")
      assert(graft.core.Names.extractNameTag(in) == want, s"extractNameTag($in)")
    }
    // the semicolon divergence: the name KEEPS tags, the name TAG drops them
    assert(graft.core.Names.extractName("sum(metric.name;tag=value)") == "metric.name;tag=value")
    assert(graft.core.Names.extractNameTag("sum(metric.name;tag=value)") == "metric.name")
    assert(graft.core.Names.extractNameTag("metric1.foo==.bar.baz") == "metric1.foo==.bar.baz")
  }
}
