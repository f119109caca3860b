package graft.sources

import org.apache.spark.sql.SparkSession
import graft.functions._
import PyValues._

/** Netzsch STA text-export scan (SURVEY.md §2.1 S1; reference
  * netzsch_sta_parser.py). A `#`-prefixed metadata preamble, a `##`
  * column-header line (names + units), then a delimited numeric body.
  *
  * Semantics reproduce the reference's OBSERVED behavior (its own
  * tests never ran in CI and disagree with the code — e.g. output
  * column names are lowercased):
  *  - header split at the first '/', unit stripped of " ()" chars;
  *  - parenthesized qualifiers removed from names, then the
  *    temp.→temperature / sensit.→sensitivity rename;
  *  - metadata values: MFC, crucible, segment, value+unit, then the
  *    int→float→date→string coercion chain;
  *  - "(UTC-5)" in date_performed becomes ISO +05:00 (dateutil's
  *    POSIX-style sign handling, netzsch_sta_parser.py:278-291);
  *  - duplicate metadata keys: last write wins (§2.4 A2).
  */
object StaSource {

  val Units: Seq[String] = Seq(
    "/°C", "/°F", "/K", "/s", "/min", "/h", "/m",
    "/µV", "/mV", "/V", "/mA", "/A", "/mbar", "/mg")

  private val KeyMapping = Map(
    "exporttype" -> "export_type",
    "remark" -> "comment",
    "type_of_crucible" -> "crucible_type",
    "tempcal" -> "temperature_calibration",
    "sensitivity" -> "sensitivity_calibration",
    "corr._file" -> "correction_file",
    "ftype" -> "file_type",
    "mtype" -> "measurement_type",
    "corr._code" -> "correction_code",
    "exo" -> "exothermic",
    "separator" -> "delimiter",
    "date/time" -> "date_performed")

  private val ColMapping = Map("temp." -> "temperature", "sensit." -> "sensitivity")

  def mapKey(key: String): String =
    KeyMapping.getOrElse(key.toLowerCase.replace(" ", "_"), key)

  /** Header names + units (netzsch_sta_parser.py:326-357 semantics). */
  def splitHeader(fields: Seq[String]): (Seq[String], Seq[Option[String]]) = {
    val (cols0, units) = fields.map { f =>
      if (f.contains("/")) {
        val Array(name, unit) = f.split("/", 2)
        (name.trim.toLowerCase.replace(" ", "_"), Some(pyStrip(unit, " ()")))
      } else (f.trim.toLowerCase.replace(" ", "_"), None)
    }.unzip
    val cols = cols0.map { c =>
      val noParen = c.replaceAll("\\([^)]*\\)", "")
      ColMapping.getOrElse(noParen, noParen)
    }
    (cols, units)
  }

  def parseMfcValue(value: String): JVal = {
    val t = value.replace(",", " ").split(" ", -1)
    JVal.obj("gas" -> JStr(t(0)), "range" -> JDbl(t(1).toDouble), "unit" -> JStr(t(2)))
  }

  def parseCrucibleValue(value: String): JVal = {
    val t = value.replace(",", " ").split(" ", -1)
    JVal.obj(
      "material" -> JStr(t(0)),
      "volume" -> JVal.obj("value" -> JDbl(t(1).toDouble), "unit" -> JStr(t(2))),
      "extra" -> JStr(t.drop(4).mkString(" ")))
  }

  /** "25°C/20.0(K/min)/250°C" | "25°C/00:20/25°C" →
    * start/end temperature + heating_rate | dwell time
    * (netzsch_sta_parser.py:224-259, incl. its numeric-prefix scan). */
  def parseSegmentValue(value: String): JVal = {
    val numeric = "0123456789-."
    val temps = value.split("/.*/", -1) // greedy: [before first /, after last /]
    val numbers = new scala.collection.mutable.ArrayBuffer[String]
    val units = new scala.collection.mutable.ArrayBuffer[String]
    temps.foreach { s =>
      val found = s.indexWhere(c => numeric.indexOf(c) < 0)
      val i = if (found >= 0) found else math.max(s.length - 1, 0)
      numbers += s.take(i)
      units += s.drop(i).replaceAll("^\\s+", "")
    }
    val parts = value.split("/", -1)
    val timeOrHr = parts.slice(1, parts.length - 1).mkString("/")
    if ("[0-9]*\\.[0-9]+\\(.*\\)".r.findFirstIn(timeOrHr).isDefined) {
      val hrUnits = timeOrHr.replace("(", " ").replace(")", " ").trim.split(" ", -1)
      JVal.obj(
        "start_temperature" -> JVal.obj("value" -> JDbl(numbers(0).toDouble), "unit" -> JStr(units(0))),
        "end_temperature" -> JVal.obj("value" -> JDbl(numbers(1).toDouble), "unit" -> JStr(units(1))),
        "heating_rate" -> JVal.obj("value" -> JDbl(hrUnits(0).toDouble), "unit" -> JStr(hrUnits(1))))
    } else if ("[0-9]+:[0-9]+".r.findFirstIn(timeOrHr).isDefined) {
      JVal.obj(
        "start_temperature" -> JVal.obj("value" -> JDbl(numbers(0).toDouble), "unit" -> JStr(units(0))),
        "end_temperature" -> JVal.obj("value" -> JDbl(numbers(1).toDouble), "unit" -> JStr(units(1))),
        "time" -> JStr(timeOrHr))
    } else JObj(Vector.empty)
  }

  def parseUnitValue(key: String, value: String): JVal = {
    val v = value.replace(",", " ").split(" ", -1)(0).toDouble
    JVal.obj("value" -> JDbl(v), "unit" -> JStr(key.split("/", -1).last))
  }

  def parseMetadataValue(key: String, value: String): JVal = {
    if (key.toLowerCase.contains("mfc") && value.nonEmpty) return parseMfcValue(value)
    if (key.toLowerCase.contains("crucible_type") && value.nonEmpty) return parseCrucibleValue(value)
    if (key.toLowerCase.contains("seg.") && value.nonEmpty) return parseSegmentValue(value)
    if (Units.exists(key.contains)) return parseUnitValue(key, value)
    pyInt(value).map(JInt(_): JVal)
      .orElse(pyFloat(value).map(JDbl(_): JVal))
      .orElse {
        if (key.toLowerCase == "date_performed") parseDateFuzzy(value).map(JStr(_): JVal)
        else parseDateIso(value).map(d => JVal.obj("date" -> JStr(d)): JVal)
      }
      .getOrElse(JStr(value))
  }

  /** One `#key: value` line → (normalized key, parsed value). */
  def processMetadataLine(line: String): (String, JVal) = {
    val Array(k0, v0) = line.drop(1).split(":", 2)
    var key = mapKey(k0.trim)
    val value = pyStrip(v0, ", \n")
    val metaVal = parseMetadataValue(key, value)
    if (Units.exists(key.contains)) key = pyStrip(key.split("/", -1)(0), " _")
    (key.replace(" ", "_").toLowerCase, metaVal)
  }

  def metadata(fileName: String, hashHex: String, lines: Array[String],
               headerEnd: Int): JObj = {
    var m = JVal.obj("file_hash" -> JVal.obj(
      "file" -> JStr(fileName), "method" -> JStr("BLAKE2b"), "hash" -> JStr(hashHex)))
    lines.take(headerEnd).foreach { line =>
      if (line.startsWith("#")) {
        val (k, v) = processMetadataLine(line)
        m = m.updated(k, v) // last write wins on duplicates
      }
    }
    m
  }

  /** Pure bytes→parsed form (no SparkSession) — runs identically on
    * the driver (single-file [[load]]) and inside executor tasks
    * ([[LabDirectory]] fleet ingest). */
  def parseBytes(path: String, bytes: Array[Byte]): LabDirectory.ParsedText = {
    val enc = Encoding.detect(bytes)
    val lines = Encoding.decode(bytes, enc).split("\n", -1)
    val delim = HeaderSniff.sniffDelimiter(lines)
    val (hEnd, fields) = HeaderSniff.findMarkerHeader(lines, delim, "##")
      .getOrElse(throw new IllegalArgumentException(s"Header with '##' not found in $path"))
    val (cols, units) = splitHeader(fields.toSeq)
    val meta = metadata(path.split("/").last, Blake2b.hex(bytes), lines, hEnd)
    val body = lines.drop(hEnd + 1).filter(_.trim.nonEmpty).toSeq
    LabDirectory.ParsedText(cols, units, delim, body,
      JVal.obj("file_metadata" -> meta, "type" -> JStr("STA")))
  }

  def load(spark: SparkSession, path: String): LabTable = {
    val p = parseBytes(path,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val df = LabTable.csvBody(spark, p.body, p.delim, p.cols)
    LabTable(LabTable.withUnits(df, p.cols.zip(p.units)), p.tableMeta)
  }
}
