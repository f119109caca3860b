package graft.sources

import org.apache.spark.sql.SparkSession
import graft.functions._
import PyValues._

/** FAA Micro Combustion Calorimeter scan (SURVEY.md §2.1 S2;
  * reference faa_mcc_parser.py): `key:\tvalue` metadata lines, a `*`
  * marker line, a tab-delimited header row (names + parenthesized
  * units), then the numeric body.
  *
  * Observed-behavior notes reproduced faithfully: the
  * sample_weight→sample_mass / combustor_temp→combustor_temperature
  * renames in the reference NEVER fire (by the time the mapping is
  * consulted the key still has a trailing underscore from the unit
  * suffix strip, faa_mcc_parser.py:102-126), so the output keys are
  * `sample_weight`/`combustor_temp`; file_hash is appended last.
  */
object MccSource {

  /** Ordered: "(c/s)" must be tried before "(c)"/"(s)". */
  private val UnitSuffixes = Seq(
    "(mg)" -> "mg", "(c/s)" -> "°C/s", "(c)" -> "°C",
    "(s)" -> "s", "(cc/min)" -> "ml/min")

  private val HeaderUnitMapping = Map(
    "C" -> "°C", "/m" -> "1/m", "sec" -> "s", "cc/min" -> "ml/min", "C/s" -> "°C/s")

  private val KeyMapping = Map(
    "sample_weight" -> "sample_mass",
    "combustor_temp" -> "combustor_temperature",
    "calibration_file" -> "temperature_calibration")

  /** Header names + units: split at " (", unit mapped
    * (faa_mcc_parser.py:169-196). */
  def splitHeader(fields: Seq[String]): (Seq[String], Seq[Option[String]]) =
    fields.map { f =>
      if (f.contains(" (")) {
        val Array(name, unit0) = f.split(" \\(", 2)
        val unit = pyStrip(unit0.replaceAll("\\)+$", ""), " ")
        (name.trim.toLowerCase.replace(" ", "_"), Some(HeaderUnitMapping.getOrElse(unit, unit)))
      } else (f.trim.toLowerCase.replace(" ", "_"), None)
    }.unzip

  def metadata(fileName: String, hashHex: String, lines: Array[String],
               headerEnd: Int): JObj = {
    var m = JObj(Vector.empty)
    lines.take(headerEnd).foreach { line =>
      val Array(k0, v0) = line.split(":", 2)
      var key = k0.trim.toLowerCase.replace(" ", "_")
      val value = pyStrip(v0, ", \n\t")
      var metaVal: JVal = coerce(value, Some("date"))
      UnitSuffixes.find { case (suffix, _) => key.endsWith(suffix) }.foreach {
        case (suffix, unit) =>
          key = key.dropRight(suffix.length)
          metaVal = JVal.obj("value" -> metaVal, "unit" -> JStr(unit))
      }
      if (key.contains("t_correction_coefficients")) {
        // merged into temperature_calibration, no direct key insert
        val coeffs = JArr(value.replace("\t", ",").split(",", -1)
          .map(x => JDbl(x.toDouble): JVal).toVector)
        val existing = m.get("temperature_calibration") match {
          case Some(o: JObj) => o
          case _ => JObj(Vector.empty)
        }
        m = m.updated("temperature_calibration", existing.updated("coefficients", coeffs))
      } else {
        if (key.contains("calibration_file")) metaVal = JVal.obj("file" -> metaVal)
        key = KeyMapping.getOrElse(key, key)
        m = m.updated(pyStrip(key, " _"), metaVal)
      }
    }
    m.updated("file_hash", JVal.obj(
      "file" -> JStr(fileName), "method" -> JStr("BLAKE2b"), "hash" -> JStr(hashHex)))
  }

  /** Pure bytes→parsed form (no SparkSession) — runs identically on
    * the driver (single-file [[load]]) and inside executor tasks
    * ([[LabDirectory]] fleet ingest). */
  def parseBytes(path: String, bytes: Array[Byte]): LabDirectory.ParsedText = {
    val enc = Encoding.detect(bytes)
    val lines = Encoding.decode(bytes, enc).split("\n", -1)
    val delim = HeaderSniff.sniffDelimiter(lines)
    val (hEnd, _) = HeaderSniff.findMarkerHeader(lines, delim, "*")
      .getOrElse(throw new IllegalArgumentException(s"'*' marker not found in $path"))
    val headerFields = lines(hEnd + 1).split(delim.toString, -1).toSeq
    val (cols, units) = splitHeader(headerFields)
    val meta = metadata(path.split("/").last, Blake2b.hex(bytes), lines, hEnd)
    val body = lines.drop(hEnd + 2).filter(_.trim.nonEmpty).toSeq
    LabDirectory.ParsedText(cols, units, delim, body,
      JVal.obj("file_metadata" -> meta, "type" -> JStr("MCC")))
  }

  def load(spark: SparkSession, path: String): LabTable = {
    val p = parseBytes(path,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val df = LabTable.csvBody(spark, p.body, p.delim, p.cols)
    LabTable(LabTable.withUnits(df, p.cols.zip(p.units)), p.tableMeta)
  }
}
