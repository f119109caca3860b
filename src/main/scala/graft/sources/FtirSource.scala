package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.collection.mutable.{LinkedHashMap => LHM}
import graft.functions._

/** Bruker OPUS FTIR binary scan (SURVEY.md §2.1 S8; reference
  * bruker_ftir_parser.py, which delegates to the external brukeropus
  * library — unavailable offline, so the block format is implemented
  * here, reverse-validated against the three fixtures):
  *
  *  - header: magic 0A0A FEFE, directory pointer at 0x0C, entry
  *    count at 0x14; directory entries are (type u32, length-in-
  *    words u32, offset u32);
  *  - a block is a DATA block iff a status block with type|0x10
  *    exists; its status block carries NPT/FXV/LXV/CSF/DAT/TIM;
  *  - data keys from the type code: result nibble (bits 12-15)
  *    1='a'bsorbance / 2='t'ransmittance / 3='r'eflectance
  *    (verified: PLF=AB ↔ 0x100F, PLF=RFL ↔ 0x300F); otherwise
  *    bits 2-3 give 1='sm' / 2='rf', with phase spectra at
  *    bits 8-11 == 0xC ('phsm') — verified numerically
  *    (result == sm / interp(rf) to 1.5e-8);
  *  - parameter blocks: 3-char tag + type u16 + size u16(words of 2)
  *    + value (0=i32, 1=f64, else NUL-terminated text);
  *  - x grid: linspace(FXV, LXV, NPT) wavenumbers; wavelength µm =
  *    10000/wn (ascending — which is what makes the reference's
  *    np.interp re-sampling valid); y = f32 array × CSF.
  *
  * The reference resamples every secondary spectrum onto the main
  * (r/a/t) wavelength grid by 1-D linear interpolation with edge
  * clamping (SURVEY.md §2.5 J1) — reproduced here, driver-side like
  * the reference (KB-scale arrays; graft.operators.Interpolate is the
  * distributed form of the same operator).
  *
  * Divergence notes (brukeropus cannot run here, so its exact label
  * strings are unverifiable): parameter keys use a curated tag→label
  * map for the tags in the fixture corpus, falling back to the bare
  * lowercase tag; the metadata key `data_performed` (sic) follows the
  * reference's own spelling.
  */
object FtirSource {

  private case class Block(blockType: Int, length: Int, offset: Int)
  private case class Spectrum(key: String, label: String, wl: Array[Double],
                              y: Array[Double], params: LHM[String, Any])

  private val DataLabels = Map(
    "r" -> "Reflectance", "a" -> "Absorbance", "t" -> "Transmittance",
    "sm" -> "Sample Spectrum", "rf" -> "Reference Spectrum",
    "phsm" -> "Sample Phase", "phrf" -> "Reference Phase",
    "igsm" -> "Sample Interferogram", "igrf" -> "Reference Interferogram")

  /** Curated OPUS parameter labels (subset appearing in the corpus). */
  private val ParamLabels = Map(
    "acc" -> "Accessory", "apt" -> "Aperture Setting", "bms" -> "Beamsplitter",
    "chn" -> "Measurement Channel", "dtc" -> "Detector",
    "hpf" -> "High Pass Filter", "lpf" -> "Low Pass Filter",
    "opf" -> "Optical Filter", "pgn" -> "Preamplifier Gain", "src" -> "Source",
    "vel" -> "Scanner Velocity", "apf" -> "Apodization Function",
    "hfq" -> "End Frequency Limit for File", "lfq" -> "Start Frequency Limit for File",
    "phr" -> "Phase Resolution", "phz" -> "Phase Correction Mode",
    "zff" -> "Zero Filling Factor", "aqm" -> "Acquisition Mode",
    "del" -> "Delay Before Measurement", "dly" -> "Stabilization Delay",
    "hfw" -> "Wanted High Frequency Limit", "lfw" -> "Wanted Low Frequency Limit",
    "nss" -> "Sample Scans", "nsr" -> "Background Scans",
    "plf" -> "Result Spectrum Type", "res" -> "Resolution",
    "tdl" -> "To Do List", "hfl" -> "High Folding Limit",
    "lfl" -> "Low Folding Limit", "lwn" -> "Laser Wavenumber",
    "abp" -> "Absolute Peak Pos in Laser*2", "ssp" -> "Sample Spacing Divisor",
    "ssm" -> "Sample Spacing Multiplier", "arg" -> "Actual Ref Gain",
    "asg" -> "Actual Signal Gain", "ass" -> "Actual Sample Scans",
    "gfw" -> "Number of Good Forward Scans", "gbw" -> "Number of Good Backward Scans",
    "bfw" -> "Number of Bad Forward Scans", "bbw" -> "Number of Bad Backward Scans",
    "pka" -> "Peak Amplitude", "bld" -> "Building", "cnm" -> "Operator Name",
    "cpy" -> "Company", "dpm" -> "Department", "exp" -> "Experiment",
    "lct" -> "Location", "sfm" -> "Sample Form", "snm" -> "Sample Name",
    "xpp" -> "Experiment Path", "ist" -> "Instrument Status",
    "cpg" -> "Character Encoding Code Page", "uid" -> "Universally Unique Identifier",
    "npt" -> "Number of Data Points", "fxv" -> "Frequency of First Point",
    "lxv" -> "Frequency of Last Point", "csf" -> "Y Scaling Factor",
    "mxy" -> "Y Maximum", "mny" -> "Y Minimum", "dpf" -> "Data Point Format",
    "dat" -> "Date of Measurement", "tim" -> "Time of Measurement",
    "dxu" -> "X Units", "adt" -> "Additional Data Treatment",
    "cfe" -> "Low Intensity Power Mode with DTGS", "cor" -> "Correlation Test Mode",
    "sot" -> "Sample Scans or Time", "tcl" -> "Command Line for Additional Data Treatment",
    "rgn" -> "Background Gain", "str" -> "Scans or Time",
    "apr" -> "ATR Pressure", "lpv" -> "Variable Low Pass Filter (cm-1)",
    "pgr" -> "Reference Preamplifier Gain", "rch" -> "Backgr. Measurement Channel",
    "rdx" -> "Extended Ready Check")

  private def paramLabel(tag: String): String =
    ParamLabels.getOrElse(tag, tag)

  private def readDirectory(b: Array[Byte]): Seq[Block] = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == 0xFEFE0A0A, "not an OPUS file")
    val dirPtr = bb.getInt(12)
    val n = bb.getInt(20)
    (0 until n).map { i =>
      Block(bb.getInt(dirPtr + 12 * i), bb.getInt(dirPtr + 12 * i + 4),
        bb.getInt(dirPtr + 12 * i + 8))
    }
  }

  /** Parse a 3-char-tag parameter block. */
  private def readParams(b: Array[Byte], blk: Block): LHM[String, Any] = {
    val out = new LHM[String, Any]
    val end = math.min(blk.offset + blk.length * 4, b.length)
    var i = blk.offset
    var done = false
    while (!done && i + 8 <= end) {
      val tag = new String(b, i, 3, java.nio.charset.StandardCharsets.US_ASCII)
      if (!tag.forall(c => c.isUpper || c.isDigit)) done = true
      else if (tag == "END") done = true
      else {
        val bb = ByteBuffer.wrap(b, i + 4, 4).order(ByteOrder.LITTLE_ENDIAN)
        val typ = bb.getShort() & 0xffff
        val sz = bb.getShort() & 0xffff
        val vOff = i + 8
        val v: Any = typ match {
          case 0 if vOff + 4 <= end =>
            ByteBuffer.wrap(b, vOff, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          case 1 if vOff + 8 <= end =>
            ByteBuffer.wrap(b, vOff, 8).order(ByteOrder.LITTLE_ENDIAN).getDouble
          case _ =>
            val raw = b.slice(vOff, math.min(vOff + 2 * sz, end))
            val nul = raw.indexOf(0.toByte)
            new String(if (nul >= 0) raw.take(nul) else raw,
              java.nio.charset.StandardCharsets.ISO_8859_1)
        }
        out(tag.toLowerCase) = v
        i = vOff + 2 * sz
      }
    }
    out
  }

  /** Data key from the block type code (see object doc). Real data
    * blocks carry amplitude complex-bits (t & 3) == 3 — parameter
    * blocks like 0x38/0x48 don't, which disambiguates them from
    * accidental (type | 0x10) pairings. */
  private def dataKey(t: Int): Option[String] = {
    if ((t & 0x3) != 3) return None
    val resultNibble = (t >> 12) & 0xF
    val channel = (t >> 2) & 0x3
    val form = (t >> 8) & 0xF
    resultNibble match {
      case 1 => Some("a")
      case 2 => Some("t")
      case 3 => Some("r")
      case 0 =>
        (form, channel) match {
          case (0xC, 1) => Some("phsm")
          case (0xC, 2) => Some("phrf")
          case (_, 1) => Some("sm")
          case (_, 2) => Some("rf")
          case _ => None
        }
      case _ => None
    }
  }

  /** np.interp: 1-D linear interpolation, edges clamped, x ascending. */
  private[sources] def interp(xNew: Array[Double], x: Array[Double],
                              y: Array[Double]): Array[Double] =
    xNew.map { xi =>
      if (xi <= x.head) y.head
      else if (xi >= x.last) y.last
      else {
        var lo = 0
        var hi = x.length - 1
        while (hi - lo > 1) {
          val mid = (lo + hi) / 2
          if (x(mid) <= xi) lo = mid else hi = mid
        }
        y(lo) + (y(hi) - y(lo)) * ((xi - x(lo)) / (x(hi) - x(lo)))
      }
    }

  private def toJVal(v: Any): JVal = v match {
    case s: String => JStr(s)
    case d: Double => JDbl(d)
    case i: Int => JInt(i.toLong)
    case l: Long => JInt(l)
    case m: LHM[_, _] => JObj(m.toVector.map { case (k, mv) => (k.toString, toJVal(mv)) })
    case j: JVal => j
  }

  /** Pure bytes→parsed form (no SparkSession) — the whole OPUS block
    * walk is byte-buffer based, so fleet ingest ([[LabDirectory]])
    * runs it unchanged inside executor tasks. */
  def parseRows(path: String, bytes: Array[Byte]): LabDirectory.ParsedRows = {
    val blocks = readDirectory(bytes)
    val byType = blocks.groupBy(_.blockType)

    // data blocks: those with a (type | 0x10) status partner
    val spectra: Seq[Spectrum] = blocks.flatMap { blk =>
      byType.get(blk.blockType | 0x10).filter(_ => (blk.blockType & 0x10) == 0)
        .flatMap(_.headOption).flatMap { status =>
          dataKey(blk.blockType).map { key =>
            val p = readParams(bytes, status)
            val npt = p("npt").asInstanceOf[Int]
            val fxv = p("fxv").asInstanceOf[Double]
            val lxv = p("lxv").asInstanceOf[Double]
            val csf = p.get("csf").collect { case d: Double => d }.getOrElse(1.0)
            // np.linspace semantics: step-based with the endpoint set
            // exactly to lxv (bit-matches the reference's grid)
            val step = if (npt > 1) (lxv - fxv) / (npt - 1) else 0.0
            val wn = Array.tabulate(npt)(i =>
              if (i == npt - 1 && npt > 1) lxv else fxv + i * step)
            val wl = wn.map(10000.0 / _)
            val bb = ByteBuffer.wrap(bytes, blk.offset, npt * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            val y = Array.fill(npt)(bb.getFloat.toDouble * csf)
            Spectrum(key, DataLabels.getOrElse(key, key), wl, y, p)
          }
        }
    }

    val mainKey = Seq("r", "a", "t").find(k => spectra.exists(_.key == k))
      .getOrElse(throw new IllegalArgumentException("No r/a/t data key in OPUS file"))
    val main = spectra.find(_.key == mainKey).get

    val others = spectra.filter(_.key != mainKey)
    val colNames = Seq("wavelength", main.label.toLowerCase.replace(" ", "_")) ++
      others.map(_.label.toLowerCase.replace(" ", "_"))
    val colData: Seq[Array[Double]] = Seq(main.wl, main.y) ++
      others.map(s => interp(main.wl, s.wl, s.y))

    val schema = StructType(colNames.map(n => StructField(n, DoubleType)))
    val rows: Seq[Row] = main.wl.indices.map(i => Row.fromSeq(colData.map(_(i))))
    val unitMap = Map("wavelength" -> "µm").withDefaultValue("a.u.")

    // parameters: category param blocks; rf variants carry bit 0x8
    def isParamBlock(t: Int): Boolean =
      Seq(0x20, 0x28, 0x30, 0x38, 0x40, 0x48, 0x60, 0x68, 0xA0).contains(t & 0xFF)
    val params = new LHM[String, Any]
    val rfParams = new LHM[String, Any]
    blocks.foreach { blk =>
      if (isParamBlock(blk.blockType)) {
        val target = if ((blk.blockType & 0x8) != 0) rfParams else params
        readParams(bytes, blk).foreach { case (tag, v) =>
          target(paramLabel(tag).toLowerCase.replace(" ", "_")) = v
        }
      }
    }

    val labels = new LHM[String, Any]
    spectra.foreach(s => labels(s.key) = s.label.toLowerCase.replace(" ", "_"))

    val meta = new LHM[String, Any]
    meta("data_labels") = labels
    meta("parameters") = params
    meta("reference_parameters") = rfParams
    meta("file_hash") = JVal.obj(
      "file" -> JStr(path.split("/").last), "method" -> JStr("BLAKE2b"),
      "hash" -> JStr(Blake2b.hex(bytes)))
    // reference's own (sic) key name, bruker_ftir_parser.py:143
    parseDatetime(main.params).foreach(dt => meta("data_performed") = dt)

    LabDirectory.ParsedRows(schema, rows,
      colNames.map(n => n -> unitMap(n)).toMap,
      JVal.obj("file_metadata" -> toJVal(meta), "type" -> JStr("FTIR")))
  }

  def load(spark: SparkSession, path: String): LabTable = {
    val p = parseRows(path,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    import scala.jdk.CollectionConverters._
    val df0 = spark.createDataFrame(p.rows.asJava, p.schema)
    val df = df0.select(df0.columns.map(c =>
      col(c).as(c, new MetadataBuilder().putString("unit", p.units(c)).build())).toSeq: _*)
    LabTable(df, p.tableMeta)
  }

  /** DAT "14/06/2021" + TIM "17:37:35.903 (GMT+0)" → ISO local time. */
  private def parseDatetime(p: LHM[String, Any]): Option[String] =
    (p.get("dat"), p.get("tim")) match {
      case (Some(d: String), Some(t: String)) =>
        val dm = "(\\d{2})/(\\d{2})/(\\d{4})".r.findFirstMatchIn(d)
        val tm = "(\\d{2}):(\\d{2}):(\\d{2})(?:\\.(\\d+))?".r.findFirstMatchIn(t)
        (dm, tm) match {
          case (Some(dd), Some(tt)) =>
            val micros = Option(tt.group(4)).map(f => (f + "000000").take(6)).getOrElse("")
            val frac = if (micros.nonEmpty) s".$micros" else ""
            Some(f"${dd.group(3)}-${dd.group(2)}-${dd.group(1)}" +
              f"T${tt.group(1)}:${tt.group(2)}:${tt.group(3)}$frac")
          case _ => None
        }
      case _ => None
    }
}
