package graft.api

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter
import graft.parser.Interval

/**
 * Graphite at-time grammar → epoch seconds: `now`, `-1d`, `noon+3h`,
 * `midnight`, `today-2d`, `20060102`, `00:00_20140101`, raw epochs,
 * tz-aware. (ref date/date.go:60-174, upstream graphite-web render/attime.py)
 */
object AtTime {

  // Go's "01/02/06" layout pivots 2-digit years at 69: 69-99 → 19xx,
  // 00-68 → 20xx ("08/12/94" is 1994) — Java's plain `yy` would pick 2094
  private val twoDigitYear = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("MM/dd/")
    .appendValueReduced(java.time.temporal.ChronoField.YEAR, 2, 2, 1969)
    .toFormatter()

  private val dateFormats = Seq(
    DateTimeFormatter.ofPattern("yyyyMMdd"),
    twoDigitYear,
    DateTimeFormatter.ofPattern("MM/dd/yyyy"))

  /** Parse with fallback: on error return `default`.
    * (ref DateParamToEpoch, date/date.go:59-67) */
  def toEpoch(s: String, default: Long, tz: ZoneId = ZoneId.of("UTC"),
              now: () => Instant = () => Instant.now()): Long =
    parse(s, tz, now).getOrElse(default)

  def parse(raw: String, tz: ZoneId = ZoneId.of("UTC"),
            now: () => Instant = () => Instant.now()): Option[Long] = {
    if (raw == null || raw.isEmpty) return None
    val s = raw.toLowerCase.trim

    // leading sign → pure relative offset from now
    if (s.startsWith("-") || s.startsWith("+"))
      return tryInterval(s, -1).map(off => now().getEpochSecond + off)

    // <ref>±<offset> (e.g. "today-2d", "noon+3h")
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '+' || c == '-') {
        val ref = reference(s.substring(0, i), tz, now)
        if (ref.isDefined)
          return tryInterval(s.substring(i), 1).map(off => ref.get + off)
      }
      i += 1
    }
    reference(s, tz, now)
  }

  private def tryInterval(s: String, defaultSign: Int): Option[Long] =
    try Some(Interval.parse(s, defaultSign)) catch { case _: Exception => None }

  private def namedTime(s: String): Option[LocalTime] = s match {
    case "midnight" => Some(LocalTime.MIDNIGHT)
    case "noon"     => Some(LocalTime.NOON)
    case "teatime"  => Some(LocalTime.of(16, 0))
    case hm if hm.contains(":") =>
      val p = hm.split(":")
      if (p.length != 2) None
      else try Some(LocalTime.of(p(0).toInt, p(1).toInt)) catch { case _: Exception => None }
    case _ => None
  }

  /** A time reference with no offset. (ref parseTimeReference, date/date.go:111-174) */
  private def reference(s: String, tz: ZoneId, now: () => Instant): Option[Long] = {
    def zNow: ZonedDateTime = now().atZone(tz)
    s match {
      case "now" => return Some(now().getEpochSecond)
      case "midnight" | "noon" | "teatime" =>
        return Some(zNow.toLocalDate.atTime(namedTime(s).get).atZone(tz).toEpochSecond)
      case _ =>
    }
    // raw epoch (but 8-digit numbers are dates, not epochs)
    if (s.forall(_.isDigit) && s.length != 8)
      return try Some(s.toLong) catch { case _: Exception => None }

    val parts = s.replaceFirst("_", " ").split("\\s+")
    val (timePart, datePart) = parts.length match {
      case 1 => ("", parts(0))
      case 2 => (parts(0), parts(1))
      case _ => return None
    }
    val date: Option[LocalDate] = datePart match {
      case "today"     => Some(zNow.toLocalDate)
      case "yesterday" => Some(zNow.toLocalDate.minusDays(1))
      case "tomorrow"  => Some(zNow.toLocalDate.plusDays(1))
      case d =>
        dateFormats.iterator.flatMap { f =>
          try Some(LocalDate.parse(d, f)) catch { case _: Exception => None }
        }.nextOption()
    }
    date.map { d =>
      val t = if (timePart.isEmpty) LocalTime.MIDNIGHT else namedTime(timePart).getOrElse(LocalTime.MIDNIGHT)
      LocalDateTime.of(d, t).atZone(tz).toEpochSecond
    }
  }
}
