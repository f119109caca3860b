package graft.sources

import graft.functions._

/** The reference's typed-coercion chain (SURVEY.md §2.3 F2) and date
  * parsing (F3/F4), with Python-compatible semantics:
  *
  *  - int() / float() acceptance rules (not Java's — no hex, no
  *    trailing 'd'/'f');
  *  - a conservative emulation of dateutil.parser.parse for the
  *    formats that occur in lab files: "MM-DD-YYYY HH:MM" /
  *    "DD-MM-YYYY HH:MM" (month-first unless the first field > 12,
  *    dateutil's default), "M/D/YYYY H:MM:SS", ISO dates;
  *  - the fuzzy variant additionally accepts a trailing "(UTC±N)"
  *    whose sign dateutil interprets POSIX-style — i.e. INVERTED in
  *    the ISO offset ("(UTC-5)" → "+05:00") — reproduced faithfully
  *    (netzsch_sta_parser.py:278-291, observed behavior).
  */
object PyValues {

  /** Python str.strip(chars) — both ends, character set. */
  def pyStrip(s: String, chars: String): String = {
    var a = 0
    var b = s.length
    while (a < b && chars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  private val IntRe = """^[+-]?\d+$""".r
  private val FloatRe = """^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$""".r

  def pyInt(s: String): Option[Long] = {
    val t = s.trim
    if (IntRe.matches(t)) t.toLongOption else None
  }

  def pyFloat(s: String): Option[Double] = {
    val t = s.trim
    if (FloatRe.matches(t)) t.toDoubleOption else None
  }

  private val DashDateTime = """^(\d{1,2})-(\d{1,2})-(\d{4})[ T](\d{1,2}):(\d{2})(?::(\d{2}))?$""".r
  private val SlashDateTime = """^(\d{1,2})/(\d{1,2})/(\d{4})[ T](\d{1,2}):(\d{2})(?::(\d{2}))?$""".r
  private val IsoDateTime = """^(\d{4})-(\d{2})-(\d{2})[ T](\d{1,2}):(\d{2})(?::(\d{2}))?$""".r
  private val IsoDate = """^(\d{4})-(\d{2})-(\d{2})$""".r

  private def iso(y: Int, mo: Int, d: Int, h: Int, mi: Int, se: Int): Option[String] =
    try {
      val dt = java.time.LocalDateTime.of(y, mo, d, h, mi, se)
      Some(dt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
    } catch { case _: java.time.DateTimeException => None }

  /** dateutil default: first field is the month unless impossible. */
  private def monthDay(a: Int, b: Int): (Int, Int) = if (a > 12) (b, a) else (a, b)

  /** Non-fuzzy parse → isoformat string, None if not a date. */
  def parseDateIso(s: String): Option[String] = s.trim match {
    case DashDateTime(a, b, y, h, mi, se) =>
      val (mo, d) = monthDay(a.toInt, b.toInt)
      iso(y.toInt, mo, d, h.toInt, mi.toInt, Option(se).map(_.toInt).getOrElse(0))
    case SlashDateTime(a, b, y, h, mi, se) =>
      val (mo, d) = monthDay(a.toInt, b.toInt)
      iso(y.toInt, mo, d, h.toInt, mi.toInt, Option(se).map(_.toInt).getOrElse(0))
    case IsoDateTime(y, mo, d, h, mi, se) =>
      iso(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, Option(se).map(_.toInt).getOrElse(0))
    case IsoDate(y, mo, d) => iso(y.toInt, mo.toInt, d.toInt, 0, 0, 0)
    case _ => None
  }

  private val UtcSuffix = """^(.*?)\s*\(UTC([+-]\d{1,2})(?::?(\d{2}))?\)$""".r

  /** Fuzzy parse (used only for date_performed): tolerates a trailing
    * "(UTC±N)" — POSIX sign inversion — else falls back to non-fuzzy. */
  def parseDateFuzzy(s: String): Option[String] = s.trim match {
    case UtcSuffix(core, off, offMin) =>
      parseDateIso(core).map { base =>
        val hours = -off.toInt // POSIX/GNU tz: "UTC-5" means +05:00
        val mins = Option(offMin).map(_.toInt).getOrElse(0)
        f"$base${if (hours < 0) "-" else "+"}${math.abs(hours)}%02d:$mins%02d"
      }
    case other => parseDateIso(other)
  }

  /** int → float → date → string (faa_mcc_parser.py:83-92 shape). */
  def coerce(value: String, dateKey: Option[String]): JVal =
    pyInt(value).map(JInt(_))
      .orElse(pyFloat(value).map(JDbl(_)))
      .orElse(parseDateIso(value).map(d =>
        dateKey.map(k => JVal.obj(k -> JStr(d)): JVal).getOrElse(JStr(d))))
      .getOrElse(JStr(value))
}
