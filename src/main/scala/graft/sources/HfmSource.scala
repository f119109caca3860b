package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable.{LinkedHashMap => LHM}
import graft.functions._

/** TA/Waters Heat Flow Meter report scan (SURVEY.md §2.1 S3;
  * reference fox_hfm_parser.py) — a UTF-16 report parsed by a
  * line-prefix state machine into nested metadata, from which the
  * tiny (≤6-row) result table is derived (§2.8 R1: direct row
  * construction, no transpose needed).
  *
  * Observed-behavior quirks reproduced: the "Number of transducer per
  * plate" branch never fires (file says "transducers"); "Thickness
  * obtained" is char-stripped with "from " (so "from instrument" →
  * "instrument"); heat-capacity runs pre-create one FEWER setpoint
  * slot than declared (offset=0 loop, fox_hfm_parser.py:129-133) —
  * consistent with those files having n-1 setpoint blocks; repeated
  * comments nest as [prev, new]; column metadata uses key "units"
  * (not "unit").
  */
object HfmSource {

  private type M = LHM[String, Any]

  private def toJVal(v: Any): JVal = v match {
    case s: String => JStr(s)
    case d: Double => JDbl(d)
    case i: Int => JInt(i.toLong)
    case l: Long => JInt(l)
    case m: LHM[_, _] =>
      JObj(m.toVector.map { case (k, mv) => (k.toString, toJVal(mv)) })
    case xs: Seq[_] => JArr(xs.toVector.map(toJVal))
    case j: JVal => j
  }

  private val DateFmt = java.time.format.DateTimeFormatter
    .ofPattern("EEEE, MMMM d, yyyy, 'Time' H:mm", java.util.Locale.ENGLISH)

  def parseDateLine(line: String): Option[String] =
    try Some(java.time.LocalDateTime.parse(line.trim, DateFmt)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))
    catch { case _: java.time.format.DateTimeParseException => None }

  private val DecimalRe = "\\d+\\.\\d+".r
  private val LettersRe = "[a-zA-Z]+".r
  private val NonAsciiUnitRe = "[^\\x00-\\x7f]+[a-zA-Z]+".r
  private val RatioUnitRe = "[a-zA-Z]/[a-zA-Z]+".r
  private val IntRe = "\\d+".r

  /** "8.67mm" → {value: 8.67, unit: "mm"} (fox_hfm_parser.py:29-33). */
  def extractValueAndUnit(s: String): M = {
    val m = new M
    m("value") = DecimalRe.findFirstIn(s).get.toDouble
    m("unit") = LettersRe.findFirstIn(s).get
    m
  }

  private def vu(s: String, unitRe: scala.util.matching.Regex): M = {
    val m = new M
    m("value") = DecimalRe.findFirstIn(s).get.toDouble
    m("unit") = unitRe.findFirstIn(s).get
    m
  }

  private def sub(m: M, key: String): M =
    m.getOrElseUpdate(key, new M).asInstanceOf[M]

  def metadata(fileName: String, hashHex: String, lines: Array[String]): M = {
    var runType = "conductivity"
    val m = new M
    for (i <- lines.indices) {
      val line = lines(i).trim
      def part(n: Int): String = line.split(":", -1)(n).trim

      if (!m.contains("date_performed"))
        parseDateLine(line).foreach(d => m("date_performed") = d)

      if (line.startsWith("Sample Name: ")) m("sample_id") = part(1)
      else if (line.startsWith("Run Mode")) {
        runType = part(1).toLowerCase.replace(" ", "_")
        if (runType == "specific_heat") runType = "volumetric_heat_capacity"
      } else if (line.startsWith("Transducer Heat Capacity Coefficients")) {
        val cs = DecimalRe.findAllIn(part(1)).toSeq
        val cc = new M
        cc("A") = cs(0).toDouble
        cc("B") = cs(1).toDouble
        sub(m, "calibration")("heat_capacity_coefficients") = cc
      } else if (line.startsWith("Thickness: ")) {
        m("thickness") = extractValueAndUnit(part(1))
      } else if (line.startsWith("Rear Left :")) {
        val t = sub(m, "thickness")
        t("rear_left") = extractValueAndUnit(part(1))
        t("rear_right") = extractValueAndUnit(part(2))
      } else if (line.startsWith("Front Left:")) {
        val t = sub(m, "thickness")
        t("front_left") = extractValueAndUnit(part(1))
        t("front_right") = extractValueAndUnit(part(2))
      } else if (line.startsWith("[") && line.endsWith("]") &&
        !line.substring(1, line.length - 1).exists(c => c == '[' || c == ']')) {
        val c = PyValues.pyStrip(line, "[]").trim
        m.get("comment") match {
          case None => m("comment") = c
          case Some(prev) => m("comment") = Seq(prev, c)
        }
      } else if (line.startsWith("Thickness obtained")) {
        sub(m, "thickness")("obtained") = PyValues.pyStrip(part(1), "from ")
      } else if (line.startsWith("Calibration used")) {
        sub(m, "calibration")("type") = part(1)
      } else if (line.startsWith("Calibration File Id")) {
        sub(m, "calibration")("file") = part(1)
      } else if (line.startsWith("Number of transducer per plate")) {
        m("number_of_transducers") = part(1).toInt // dead branch: files say "transducers"
      } else if (line.startsWith("Number of Setpoints")) {
        val n = part(1).toInt
        m("number_of_setpoints") = n
        val offset = if (runType == "conductivity") 1 else 0
        for (j <- i + 1 until i + offset + n)
          sub(sub(m, "setpoints"), s"setpoint_${j - i}")
      } else if (line.startsWith("Setpoint No.")) {
        val sp = line.split("\\.", -1)(1).trim.toInt
        val spm = m("setpoints").asInstanceOf[M](s"setpoint_$sp").asInstanceOf[M]
        for (j <- 1 until 19 if i + j < lines.length) {
          if (!spm.contains("date_performed"))
            parseDateLine(lines(i - 2).trim).foreach(d => spm("date_performed") = d)
          val subLine = lines(i + j).trim
          def raw: String = lines(i + j).split(":", -1)(1).trim
          if (subLine.startsWith("Setpoint Upper:"))
            sub(spm, "setpoint_temperature")("upper") = vu(raw, NonAsciiUnitRe)
          else if (subLine.startsWith("Setpoint Lower:"))
            sub(spm, "setpoint_temperature")("lower") = vu(raw, NonAsciiUnitRe)
          else if (subLine.startsWith("Temperature Upper"))
            sub(spm, "temperature")("upper") = vu(raw, NonAsciiUnitRe)
          else if (subLine.startsWith("Temperature Lower"))
            sub(spm, "temperature")("lower") = vu(raw, NonAsciiUnitRe)
          else if (subLine.startsWith("CalibFactor  Upper")) {
            val c = new M
            c("value") = raw.toDouble
            c("unit") = "µV/W"
            sub(spm, "calibration")("upper") = c
          } else if (subLine.startsWith("CalibFactor  Lower")) {
            val c = new M
            c("value") = raw.toDouble
            c("unit") = "µV/W"
            sub(spm, "calibration")("lower") = c
          } else if (subLine.startsWith("Results Upper"))
            sub(spm, "results")("upper") = vu(raw, RatioUnitRe)
          else if (subLine.startsWith("Results Lower"))
            sub(spm, "results")("lower") = vu(raw, RatioUnitRe)
          else if (subLine.startsWith("Temperature Equilibrium"))
            sub(spm, "thermal_equilibrium")("temperature") = raw.toDouble
          else if (subLine.startsWith("Between Block HFM Equil."))
            sub(spm, "thermal_equilibrium")("between_block") = raw.toDouble
          else if (subLine.startsWith("HFM Percent Change"))
            sub(spm, "thermal_equilibrium")("percent_change") = raw.toDouble
          else if (subLine.startsWith("Min Number of Blocks"))
            sub(spm, "thermal_equilibrium")("min_number_of_blocks") = raw.toDouble
          else if (subLine.startsWith("Calculation Blocks"))
            sub(spm, "thermal_equilibrium")("calculation_blocks") = raw.toDouble
          else if (subLine.startsWith("Temperature Average"))
            spm("temperature_average") = vu(raw, NonAsciiUnitRe)
          else if (subLine.startsWith("Specific Heat")) {
            val v = IntRe.findFirstIn(raw).get
            val c = new M
            c("value") = v.toDouble
            c("unit") = raw.replace(v, "").trim
            spm("volumetric_heat_capacity") = c
          }
        }
      }
    }
    m("type") = runType
    val fh = new M
    fh("file") = fileName
    fh("method") = "BLAKE2b"
    fh("hash") = hashHex
    m("file_hash") = fh
    m
  }

  /** Fleet-frame schema: run_type + the union of both variant
    * schemas (a mixed directory of conductivity and heat-capacity
    * runs lands in one frame, absent columns null). */
  val FleetSchema: StructType = StructType(Seq(
    StructField("run_type", StringType),
    StructField("setpoint", IntegerType),
    StructField("upper_temperature", DoubleType),
    StructField("lower_temperature", DoubleType),
    StructField("upper_thermal_conductivity", DoubleType),
    StructField("lower_thermal_conductivity", DoubleType),
    StructField("average_temperature", DoubleType),
    StructField("volumetric_heat_capacity", DoubleType)))

  /** Pure bytes→parsed form for fleet ingest: the variant table with
    * a leading run_type discriminator column. */
  def parseRows(path: String, bytes: Array[Byte]): LabDirectory.ParsedRows = {
    val (schema, rows, colUnits, runType, meta) = variantTable(path, bytes)
    LabDirectory.ParsedRows(
      StructType(StructField("run_type", StringType) +: schema.fields.toSeq),
      rows.map(r => Row.fromSeq(runType +: r.toSeq)),
      colUnits, JVal.obj("file_metadata" -> toJVal(meta: Any), "type" -> JStr("HFM")),
      unitKey = "units")
  }

  /** Derive the result table from metadata (fox_hfm_parser.py:407-479):
    * two fixed schema variants chosen by run mode. */
  private def variantTable(path: String, bytes: Array[Byte])
      : (StructType, Seq[Row], Map[String, String], String, M) = {
    val enc = Encoding.detect(bytes)
    val lines = Encoding.decode(bytes, enc).split("\n", -1)
    val meta = metadata(path.split("/").last, Blake2b.hex(bytes), lines)
    val setpoints = meta("setpoints").asInstanceOf[M]
    def g(m: M, path: String*): Any = path.foldLeft(m: Any) {
      case (cur: M, k) => cur(k)
      case (other, _) => other
    }
    val runType = meta("type").asInstanceOf[String]
    val (schema, rows, colUnits) =
      if (runType == "conductivity") {
        val schema = StructType(Seq(
          StructField("setpoint", IntegerType),
          StructField("upper_temperature", DoubleType),
          StructField("lower_temperature", DoubleType),
          StructField("upper_thermal_conductivity", DoubleType),
          StructField("lower_thermal_conductivity", DoubleType)))
        var units = Seq.empty[String]
        val rows = setpoints.toSeq.map { case (k, v0) =>
          val v = v0.asInstanceOf[M]
          units = Seq(
            g(v, "temperature", "upper", "unit").toString,
            g(v, "temperature", "lower", "unit").toString,
            g(v, "results", "upper", "unit").toString,
            g(v, "results", "lower", "unit").toString)
          Row(k.split("_")(1).toInt,
            g(v, "temperature", "upper", "value"),
            g(v, "temperature", "lower", "value"),
            g(v, "results", "upper", "value"),
            g(v, "results", "lower", "value"))
        }
        (schema, rows, schema.fieldNames.drop(1).zip(units).toMap)
      } else {
        val schema = StructType(Seq(
          StructField("setpoint", IntegerType),
          StructField("average_temperature", DoubleType),
          StructField("volumetric_heat_capacity", DoubleType)))
        var units = Seq.empty[String]
        val rows = setpoints.toSeq.map { case (k, v0) =>
          val v = v0.asInstanceOf[M]
          units = Seq(
            g(v, "temperature_average", "unit").toString,
            g(v, "volumetric_heat_capacity", "unit").toString)
          Row(k.split("_")(1).toInt,
            g(v, "temperature_average", "value"),
            g(v, "volumetric_heat_capacity", "value"))
        }
        (schema, rows, schema.fieldNames.drop(1).zip(units).toMap)
      }
    (schema, rows, colUnits, runType, meta)
  }

  def load(spark: SparkSession, path: String): LabTable = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (schema, rows, colUnits, _, meta) = variantTable(path, bytes)
    import scala.jdk.CollectionConverters._
    val df0 = spark.createDataFrame(rows.asJava, schema)
    val df = df0.select(df0.columns.map { c =>
      colUnits.get(c) match {
        case Some(u) =>
          org.apache.spark.sql.functions.col(c)
            .as(c, new MetadataBuilder().putString("units", u).build())
        case None => org.apache.spark.sql.functions.col(c)
      }
    }.toSeq: _*)
    LabTable(df, JVal.obj(
      "file_metadata" -> toJVal(meta: Any), "type" -> JStr("HFM")))
  }
}
