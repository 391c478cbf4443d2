package graft.core

/**
 * Metric-name surgery for tag and node extraction.
 *
 * A rendered series name is usually a function wrapper around the fetched
 * path — `sumSeries(metric.{a,b}*.b)` — but node indexing (`aliasByNode`,
 * `groupByNode`, `AggKey`) and tag derivation operate on the INNER metric
 * path. These helpers mirror the reference's extraction state machine
 * (ref expr/types/extract.go:19-110) and graphite tagged-name parsing
 * (ref expr/tags/helper.go:160-206):
 *
 *  - the inner name is the character run after the last unmatched `(`,
 *    terminated by `,` / `)` outside braces (braces guard `{a,b}` globs);
 *  - a `seriesByTag(...)` call is kept whole, including its arguments;
 *  - `extractNameTag` additionally stops at `;` (the name tag excludes the
 *    tag list), `extractName` keeps it (tags are parsed from it).
 */
object Names {

  private def scan(s: String, stopAtSemicolon: Boolean): String = {
    var start = 0
    var braces = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '{' => braces += 1
        case '}' =>
          if (braces == 0) return s.substring(start, i) // unmatched close terminates
          braces -= 1
        case ',' => if (braces == 0) return s.substring(start, i)
        case '(' =>
          if (i >= 11 && s.substring(i - 11, i) == "seriesByTag") {
            val n = i - 11
            val end = s.indexOf(')', n)
            return if (end == -1) s.substring(n) else s.substring(n, end + 1)
          }
          start = i + 1
        case ')' => return s.substring(start, i)
        case ';' if stopAtSemicolon => return s.substring(start, i)
        case _ =>
      }
      i += 1
    }
    s.substring(start)
  }

  /** Inner metric name including any `;tag=value` suffix. */
  def extractName(s: String): String = scan(s, stopAtSemicolon = false)

  /** Inner metric name with the tag list stripped — the `name` tag value. */
  def extractNameTag(s: String): String = scan(s, stopAtSemicolon = true)

  /** Parse a graphite tagged name `path;k=v;k2=v2` into a tag map (always
    * includes `name` → path; valueless tags map to ""; tags starting with
    * `=` or empty segments are skipped). */
  def extractTags(s: String): Map[String, String] = {
    val idx = s.indexOf(';')
    if (idx < 0) return Map("name" -> s)
    val b = Map.newBuilder[String, String]
    b += ("name" -> s.substring(0, idx))
    var rest = s.substring(idx + 1)
    var done = false
    while (!done) {
      val semi = rest.indexOf(';')
      val seg = if (semi < 0) rest else rest.substring(0, semi)
      val eq = seg.indexOf('=')
      if (seg.nonEmpty && eq != 0) {
        if (eq < 0) b += (seg -> "")
        else b += (seg.substring(0, eq) -> seg.substring(eq + 1))
      }
      if (semi < 0) done = true else rest = rest.substring(semi + 1)
    }
    b.result()
  }
}
