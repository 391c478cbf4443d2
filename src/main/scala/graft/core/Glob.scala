package graft.core

/**
 * Graphite metric-path glob → Java regex.
 *
 * Grammar (ref pkg/parser/parser.go:701-715,864-959): `*` matches any run of
 * characters within one dot-separated node, `?` a single character, `[a-z]`
 * character classes, `{a,b}` alternation (may nest commas but not braces).
 * The produced regex is fully anchored.
 */
object Glob {

  /** True if the string contains any glob metacharacter. */
  def isGlob(s: String): Boolean = s.exists(c => c == '*' || c == '?' || c == '[' || c == '{')

  def toRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[^.]*")
        case '?' => sb.append("[^.]")
        case '[' =>
          val close = glob.indexOf(']', i)
          if (close < 0) { sb.append("\\["); }
          else { sb.append(glob.substring(i, close + 1)); i = close }
        case '{' =>
          val close = glob.indexOf('}', i)
          if (close < 0) { sb.append("\\{") }
          else {
            val alts = glob.substring(i + 1, close).split(",", -1).map(java.util.regex.Pattern.quote)
            sb.append(alts.mkString("(?:", "|", ")"))
            i = close
          }
        case '.' => sb.append("\\.")
        case c if "\\^$()+|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }

  /** Compile once, reusable matcher. */
  def matcher(glob: String): String => Boolean = {
    val p = java.util.regex.Pattern.compile(toRegex(glob))
    s => p.matcher(s).matches()
  }

  /** Expand brace alternations into brace-free branch globs
    * (`{a,b}.web.*` → `a.web.*`, `b.web.*`), capped at `cap` total
    * branches. Returns None when expansion would exceed the cap —
    * callers fall back to treating the glob as one opaque branch. A
    * glob with no (complete) brace group returns itself as the single
    * branch. Mirrors the reference routing each brace alternative to
    * its backend subset via per-prefix pathcache matching
    * (ref pathcache/pathcache.go:34-56). */
  def expandBraces(glob: String, cap: Int = 64): Option[Seq[String]] = {
    var branches = Seq(glob)
    var progress = true
    while (progress) {
      progress = false
      branches = branches.flatMap { b =>
        val open = b.indexOf('{')
        val close = if (open < 0) -1 else b.indexOf('}', open)
        if (close < 0) Seq(b)
        else {
          progress = true
          b.substring(open + 1, close).split(",", -1).toSeq
            .map(a => b.substring(0, open) + a + b.substring(close + 1))
        }
      }
      // per-round cap: bounds work even for adversarial many-brace globs
      if (branches.length > cap) return None
    }
    Some(branches)
  }

  /** Literal prefix of a glob (chars before the first metacharacter).
    * `rlike` cannot push into a Parquet scan, but `startsWith(prefix)` can
    * (StringStartsWith → row-group pruning on name column statistics). */
  def literalPrefix(glob: String): String = {
    val cut = glob.indexWhere(c => c == '*' || c == '?' || c == '[' || c == '{')
    if (cut < 0) glob else glob.substring(0, cut)
  }
}
