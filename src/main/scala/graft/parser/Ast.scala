package graft.parser

/**
 * Graphite target-expression IR, mirroring the reference's `expr` struct
 * (ref pkg/parser/parser.go:20-28: etype Name|Func|Const|String|Bool).
 */
sealed trait Ast {
  /** Canonical source form — used for result naming (`sumSeries(rawArgs)`). */
  def print: String
}

/** Metric path / glob leaf (possibly a seriesByTag(...) opaque target). */
final case class NameExpr(target: String) extends Ast {
  def print: String = target
}

final case class Num(v: Double) extends Ast {
  def print: String =
    if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString else v.toString
}

final case class Str(v: String) extends Ast {
  def print: String = "'" + v + "'"
}

final case class BoolLit(v: Boolean) extends Ast {
  def print: String = v.toString
}

/** Compiler-internal leaf: an already-built series frame. Never produced by
  * the parser — the groupByNode callback machinery injects one so a group's
  * frame can be fed to any registry function as its series argument
  * (the reference's re-parse-and-eval of `callback(group)`,
  * ref groupByNode/function.go:30-140). */
final case class FrameExpr(df: org.apache.spark.sql.DataFrame, label: String = "<frame>") extends Ast {
  def print: String = label
}

final case class FuncCall(name: String, args: Seq[Ast], named: Map[String, Ast],
                          raw: String = "") extends Ast {
  def print: String = {
    val pos = args.map(_.print)
    val kw = named.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${v.print}" }
    s"$name(${(pos ++ kw).mkString(",")})"
  }
  /** Raw argument list for result naming. The parser captures the ORIGINAL
    * source span, so names preserve the request's spacing and quote style
    * exactly like the reference's `e.RawArgs()` (ref pkg/parser parser
    * `expr.argString`) — `diffSeries(time("t"), a)` keeps the space and
    * double quotes. Synthesized calls (pipes, rewrites) fall back to the
    * canonical print form. */
  def rawArgs: String =
    if (raw.nonEmpty) raw else print.stripPrefix(name + "(").stripSuffix(")")
}
