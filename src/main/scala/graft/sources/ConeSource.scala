package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.functions._
import Xlsx._

/** Deatak cone-calorimeter XLSM scan (SURVEY.md §2.1 S4-S6; reference
  * deatak_cone_parser.py). Sheet 2 ("Scan Data"): row 1 = column
  * names, rows 2-4 = acquisition parameters, row 5 = units, rows 6+ =
  * data. Sheet 1 ("Scalar Data"): headerless key/value metadata rows.
  *
  * The reference drops `Names` and the derivable `Ext Coeff`
  * (docs/cone.md:17), renames via its mapping, and merges duplicate
  * metadata keys into lists (§2.4 A1 — both PRE/POST TEST CMT land
  * under `comment`). Numeric XLSX cells are doubles (all numbers in
  * OOXML are), matching the calamine-based reference; integral-valued
  * metadata cells surface as ints per its int→float coercion.
  */
object ConeSource {

  private val ColMapping = Map(
    "Stack TC" -> "stack_temperature",
    "Smoke TC" -> "smoke_temperature",
    "Exh Press" -> "exhaust_pressure",
    "Ext Coeff" -> "extinction_coefficient",
    "Flame Verif" -> "flame_verification",
    "Smoke Comp" -> "smoke_laser_compensation",
    "Smoke Meas" -> "smoke_laser_measurement")

  private val UnitMapping = Map("C" -> "°C", "/m" -> "1/m", "sec" -> "s")

  private val MetaKeyMapping = Map(
    "test_ident" -> "test_id",
    "surf_area" -> "surface_area",
    "specimen_mass" -> "sample_mass",
    "pre_test_cmt" -> "comment",
    "post_test_cmt" -> "comment")

  private def normName(n: String): String =
    ColMapping.getOrElse(n, n).toLowerCase.replace(" ", "_")

  /** Units from sheet-2 row 5, keyed by normalized column name
    * (deatak_cone_parser.py:63-107). */
  def units(grid: Vector[Map[Int, Cell]]): Map[String, String] = {
    val names = grid(0).collect { case (c, StrCell(s)) => c -> s }
    val unitRow = grid(4)
    names.toSeq.collect {
      case (c, name) if name != "Names" && unitRow.contains(c) =>
        val u = unitRow(c) match {
          case StrCell(s) => s
          case NumCell(v) => v.toString
          case BoolCell(b) => b.toString
        }
        normName(name) -> UnitMapping.getOrElse(u, u)
    }.toMap
  }

  /** Numeric coercion for sheet-1 metadata cells.
    *
    * The reference receives cell values as fastexcel/polars-rendered
    * STRINGS and runs int(s) → float(s) (deatak_cone_parser.py:151-158);
    * Python's float string form always carries a decimal point, so
    * int(s) never fires on a numeric cell and integral values stay
    * floats ("5.0"). Our native mode keeps the typed cell and surfaces
    * whole doubles as ints ("5") — usually what a consumer wants.
    * `FloatRoundTrip` reproduces the reference byte layout instead. */
  sealed trait NumericMode
  object NumericMode {
    /** Typed cells; whole doubles become JSON ints. */
    case object NativeInt extends NumericMode
    /** Reference-faithful float→string→int round trip: numeric cells
      * always surface as floats (int() never parses "5.0"). */
    case object FloatRoundTrip extends NumericMode
  }

  /** Sheet-1 key/value metadata with duplicate-key list merge
    * (deatak_cone_parser.py:110-174). */
  def metadata(fileName: String, hashHex: String,
               grid: Vector[Map[Int, Cell]],
               mode: NumericMode = NumericMode.NativeInt): JObj = {
    var m = JObj(Vector.empty)
    grid.foreach { row =>
      (row.get(0), row.get(1)) match {
        case (Some(StrCell(k0)), Some(v0)) =>
          val key0 = k0.trim.toLowerCase.replace(" ", "_")
          val key = MetaKeyMapping.getOrElse(key0, key0)
          val v: JVal = v0 match {
            case StrCell(s) =>
              val t = s.trim
              PyValues.pyInt(t).map(JInt(_): JVal)
                .orElse(PyValues.pyFloat(t).map(JDbl(_): JVal))
                .getOrElse(JStr(t))
            case NumCell(d) => mode match {
              case NumericMode.NativeInt =>
                if (d.isWhole && math.abs(d) < 1e15) JInt(d.toLong) else JDbl(d)
              case NumericMode.FloatRoundTrip => JDbl(d)
            }
            case BoolCell(b) => JBool(b)
          }
          m.get(key) match {
            case Some(JArr(items)) => m = m.updated(key, JArr(items :+ v))
            case Some(prev) => m = m.updated(key, JArr(Vector(prev, v)))
            case None => m = m + (key -> v)
          }
        case _ => // rows without a key/value pair are skipped
      }
    }
    m.updated("file_hash", JVal.obj(
      "file" -> JStr(fileName), "method" -> JStr("BLAKE2b"), "hash" -> JStr(hashHex)))
  }

  /** Parse the workbook at `zipPath` (the OOXML reader needs a
    * seekable file) into the pre-Spark parsed form; `path`/`bytes`
    * only feed the file-hash metadata. */
  private def parsedFrom(path: String, bytes: Array[Byte], zipPath: String,
                         mode: NumericMode): LabDirectory.ParsedRows = {
    val scan = Xlsx.readSheet(zipPath, 2)
    val names = scan(0).collect { case (c, StrCell(s)) => c -> s }.toSeq.sortBy(_._1)
    val data = scan.drop(5)
    // column Spark types: any string cell → string, else double;
    // Names and the derivable Ext Coeff are dropped (docs/cone.md:17)
    val colTypes: Seq[(Int, String, DataType)] = names.collect {
      case (ci, name) if name != "Names" && name != "Ext Coeff" =>
        val isStr = data.exists(_.get(ci).exists(_.isInstanceOf[StrCell]))
        (ci, name, if (isStr) StringType else DoubleType)
    }
    val schema = StructType(colTypes.map { case (_, n, t) =>
      StructField(normName(n), t) })
    val rows: Seq[Row] = data.map { r =>
      Row.fromSeq(colTypes.map { case (ci, _, t) =>
        r.get(ci).map[Any] {
          case NumCell(v) => if (t == StringType) v.toString else v
          case StrCell(s) =>
            if (t == StringType) s else s.toDoubleOption.map(d => d: Any).orNull
          case BoolCell(b) => if (t == StringType) b.toString else (if (b) 1.0 else 0.0)
        }.orNull
      })
    }
    val meta = metadata(path.split("/").last, Blake2b.hex(bytes),
      Xlsx.readSheet(zipPath, 1), mode)
    LabDirectory.ParsedRows(schema, rows, units(scan),
      JVal.obj("file_metadata" -> meta, "type" -> JStr("Cone")))
  }

  /** Pure-ish bytes→parsed form for fleet ingest: the OOXML reader
    * needs random access, so bytes spill to a task-local temp file
    * (instrument workbooks are KB–MB; the spill is trivial next to
    * the parse). */
  def parseRows(path: String, bytes: Array[Byte],
                mode: NumericMode = NumericMode.NativeInt): LabDirectory.ParsedRows = {
    val tmp = java.nio.file.Files.createTempFile("cone", ".xlsm")
    try {
      java.nio.file.Files.write(tmp, bytes)
      parsedFrom(path, bytes, tmp.toString, mode)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  def load(spark: SparkSession, path: String,
           mode: NumericMode = NumericMode.NativeInt): LabTable = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val p = parsedFrom(path, bytes, path, mode)
    import scala.jdk.CollectionConverters._
    var df = spark.createDataFrame(p.rows.asJava, p.schema)
    df = df.select(df.columns.map { c =>
      p.units.get(c) match {
        case Some(u) => col(c).as(c, new MetadataBuilder().putString("unit", u).build())
        case None => col(c)
      }
    }.toSeq: _*)
    LabTable(df, p.tableMeta)
  }
}
