package graft.parser

/**
 * Recursive-descent parser for Graphite "target" expressions — a fresh
 * implementation of the grammar documented by the reference parser
 * (ref pkg/parser/parser.go:667-959): metric globs, function calls with
 * positional + named args, single/double-quoted strings, numbers, booleans,
 * and the pipe syntax `a.b | sum | alias('x')` which folds into nested calls
 * (ref parser.go:676-698). `seriesByTag(...)` is kept opaque as a name leaf
 * (ref parser.go:639-643).
 */
object Parser {

  final case class ParseException(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  def parse(input: String): Ast = {
    val p = new P(input)
    val e = p.parsePipe()
    p.skipWs()
    if (!p.eof) throw ParseException(s"trailing input '${p.rest}'", p.pos)
    e
  }

  /** Longest leading expression + unconsumed remainder — the reference
    * `ParseExpr` contract (ref pkg/parser/parser.go ParseExpr returns
    * (expr, rem, err)); callers decide whether a remainder is an error,
    * like the render tier does. */
  def parsePrefix(input: String): (Ast, String) = {
    val p = new P(input)
    val e = p.parsePipe()
    (e, input.substring(p.pos))
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    /** expr ('|' funcname['(' args ')'])* — pipe folds LHS as first arg. */
    def parsePipe(): Ast = {
      var lhs = parseExpr()
      skipWs()
      while (!eof && peek == '|') {
        pos += 1
        skipWs()
        val fname = parseIdent()
        skipWs()
        val (args, named, _) =
          if (!eof && peek == '(') parseArgs()
          else (Seq.empty[Ast], Map.empty[String, Ast], "")
        lhs = FuncCall(fname, lhs +: args, named)
        skipWs()
      }
      lhs
    }

    def parseExpr(): Ast = {
      skipWs()
      if (eof) throw ParseException("unexpected end of input", pos)
      peek match {
        case '\'' | '"' => Str(parseQuoted())
        case c if c.isDigit || c == '-' || c == '+' => parseNumberOrName()
        case _ => parseNameOrCall()
      }
    }

    private def parseQuoted(): String = {
      val q = peek
      pos += 1
      val sb = new StringBuilder
      while (!eof && peek != q) { sb.append(peek); pos += 1 }
      if (eof) throw ParseException("unterminated string", pos)
      pos += 1
      sb.toString
    }

    /** Numbers; falls back to a name if the token continues with path chars
      * (e.g. `1xx.count` is a metric, not a number). */
    private def parseNumberOrName(): Ast = {
      val start = pos
      if (peek == '-' || peek == '+') pos += 1
      while (!eof && (peek.isDigit || peek == '.')) pos += 1
      // scientific notation
      if (!eof && (peek == 'e' || peek == 'E')) {
        val mark = pos
        pos += 1
        if (!eof && (peek == '-' || peek == '+')) pos += 1
        if (!eof && peek.isDigit) { while (!eof && peek.isDigit) pos += 1 }
        else pos = mark
      }
      val tok = s.substring(start, pos)
      if (!eof && isNameChar(peek)) { pos = start; return parseNameOrCall() }
      try Num(tok.toDouble)
      catch { case _: NumberFormatException => pos = start; parseNameOrCall() }
    }

    // NOTE: ',' and '=' are NOT name chars at top level — commas inside
    // braces/brackets are handled by the depth-tracking scan in
    // parseNameOrCall; '=' delimits named args.
    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || "._-*?:#%$[]{};<>!^~@+/&".indexOf(c.toInt) >= 0

    private def parseIdent(): String = {
      val start = pos
      while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '.')) pos += 1
      if (pos == start) throw ParseException("expected identifier", pos)
      s.substring(start, pos)
    }

    /** Name glob (brace/bracket aware) or function call. A backslash makes
      * the next char a literal name char and is itself dropped —
      * `fo\(o\).bar` names the metric `fo(o).bar`, `metric\\a` names
      * `metric\a` (ref pkg/parser/parser.go:876-901). */
    private def parseNameOrCall(): Ast = {
      val buf = new StringBuilder
      var braces = 0
      var brackets = 0
      var done = false
      while (!eof && !done) {
        val c = peek
        if (c == '\\' && pos + 1 < s.length) {
          buf.append(s.charAt(pos + 1)); pos += 2
        } else {
          val take =
            if (c == '{') { braces += 1; true }
            else if (c == '}') { if (braces == 0) false else { braces -= 1; true } }
            else if (c == '[') { brackets += 1; true }
            else if (c == ']') { if (brackets == 0) false else { brackets -= 1; true } }
            else if (c == ',') braces > 0 || brackets > 0
            else if (c == '=')
              // trailing '=' padding is part of a name (base64 node names);
              // only `key=value` makes it a separator
              // (ref pkg/parser/parser.go:921-930)
              pos + 1 >= s.length || { val n = s.charAt(pos + 1); n == '=' || n == ',' || n == ')' }
            else if (c == '(' || c == ')' || c == '|' || c.isWhitespace) false
            else isNameChar(c)
          if (take) { buf.append(c); pos += 1 } else done = true
        }
      }
      val tok = buf.toString
      if (tok.isEmpty) throw ParseException(s"unexpected char '${peek}'", pos)
      skipWs()
      if (!eof && peek == '(') {
        if (tok == "seriesByTag") {
          // opaque: capture the whole call as a name target
          val argStart = pos
          var depth = 0
          do {
            val c = peek
            if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            else if (c == '\'' || c == '"') { parseQuoted(); pos -= 1 } // consume string; loop advances
            pos += 1
          } while (!eof && depth > 0)
          NameExpr(tok + s.substring(argStart, pos))
        } else {
          val (args, named, raw) = parseArgs()
          FuncCall(tok, args, named, raw)
        }
      } else if (tok == "true" || tok == "True") BoolLit(true)
      else if (tok == "false" || tok == "False") BoolLit(false)
      else if (tok == "none" || tok == "None") Str("")
      else NameExpr(tok)
    }

    /** '(' expr (',' expr)* ')' with named args `ident=value`. Also returns
      * the raw source span between the parens (result-naming input). */
    def parseArgs(): (Seq[Ast], Map[String, Ast], String) = {
      require(peek == '(')
      pos += 1
      val rawStart = pos
      val args = Seq.newBuilder[Ast]
      var named = Map.empty[String, Ast]
      skipWs()
      if (!eof && peek == ')') { pos += 1; return (args.result(), named, "") }
      var done = false
      while (!done) {
        skipWs()
        // named arg lookahead: ident '='
        val save = pos
        val isNamed = {
          var i = pos
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          i > pos && i < s.length && s.charAt(i) == '=' &&
            // `x=` followed by '=', ',' or ')' is a base64-padded NAME, not a
            // named arg (ref pkg/parser/parser.go:921-930)
            (i + 1 < s.length && { val n = s.charAt(i + 1); n != '=' && n != ',' && n != ')' })
        }
        if (isNamed) {
          val key = parseIdent()
          pos += 1 // '='
          named += key -> parsePipe()
        } else {
          pos = save
          args += parsePipe()
        }
        skipWs()
        if (eof) throw ParseException("unterminated call", pos)
        peek match {
          case ',' => pos += 1
          case ')' => pos += 1; done = true
          case c => throw ParseException(s"expected ',' or ')' but got '$c'", pos)
        }
      }
      (args.result(), named, s.substring(rawStart, pos - 1))
    }
  }
}

/**
 * Graphite interval strings → seconds (ref pkg/parser/interval.go:11-79):
 * sign, int, unit in {s, min, h, d, w, mon, y} with long-form synonyms.
 * `defaultSign` mirrors the reference's context-dependent default direction.
 */
object Interval {
  /** Strict graphite interval grammar: `[+-]?(<digits><unit>)+`. Empty
    * strings, bare signs, missing digits and missing/unknown units all
    * error, exactly like the reference (ref pkg/parser/interval.go:11-79 —
    * `Atoi("")` fails, empty unit hits the default case). */
  def parse(str: String, defaultSign: Int = 1): Long = {
    var s = str.trim
    if (s.isEmpty || s == "-" || s == "+")
      throw new IllegalArgumentException(s"unknown time units in '$str'")
    var sign = defaultSign
    if (s.startsWith("-")) { sign = -1; s = s.substring(1) }
    else if (s.startsWith("+")) { sign = 1; s = s.substring(1) }
    var total = 0L
    var i = 0
    while (i < s.length) {
      var j = i
      while (j < s.length && (s.charAt(j).isDigit)) j += 1
      if (j == i) throw new IllegalArgumentException(s"missing count in interval '$str'")
      val num = s.substring(i, j).toLong
      var k = j
      while (k < s.length && !s.charAt(k).isDigit) k += 1
      val unit = s.substring(j, k).toLowerCase
      val secs = unit match {
        case "s" | "sec" | "secs" | "second" | "seconds" => 1L
        case "min" | "mins" | "minute" | "minutes" | "m" => 60L
        case "h" | "hr" | "hrs" | "hour" | "hours" => 3600L
        case "d" | "day" | "days" => 86400L
        case "w" | "wk" | "wks" | "week" | "weeks" => 604800L
        case "mon" | "month" | "months" => 2592000L
        case "y" | "yr" | "yrs" | "year" | "years" => 31536000L
        case other => throw new IllegalArgumentException(s"unknown interval unit '$other' in '$str'")
      }
      try total = Math.addExact(total, Math.multiplyExact(sign.toLong * num, secs))
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(s"interval '$str' out of range") }
      i = k
    }
    // int32 result range, like the reference (ref pkg/parser/interval.go:75-78)
    if (total > Int.MaxValue || total < Int.MinValue)
      throw new IllegalArgumentException(s"interval '$str' out of range")
    total
  }
}
