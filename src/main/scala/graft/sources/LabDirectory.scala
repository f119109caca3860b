package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.functions.{JObj, JStr}

/** Directory-scale ingest for the text-export instrument formats
  * (STA §2.1 S1, MCC §2.1 S2): the reference parses one file per call
  * (netzsch_sta_parser.py:30, faa_mcc_parser.py:12); a fleet of 10⁶
  * instrument files needs the same parse fanned out across executors.
  *
  * Shape: the driver lists paths and parses ONLY the head file to pin
  * the output schema (exactly the single-file loader's inference, so
  * the two paths agree); executors then read + parse whole files —
  * each file is one task, the natural unit for KB–MB instrument
  * exports — and emit typed rows tagged with `source_file`. Files
  * whose header differs are reconciled BY COLUMN NAME against the
  * pinned schema (missing column → null, extra column → dropped), so
  * the two STA export variants land in one frame.
  *
  * I/O goes through the Hadoop FileSystem API, so `dir` may live on
  * any configured filesystem (local, HDFS, S3A), and bytes are read
  * inside tasks — the driver never holds file contents. Per-file
  * table metadata is a separate one-row-per-file frame
  * ([[metadataTable]]) rather than a per-row duplicate.
  */
object LabDirectory {

  /** Parser-independent parsed form of one text-export file. */
  case class ParsedText(cols: Seq[String], units: Seq[Option[String]],
                        delim: Char, body: Seq[String], tableMeta: JObj)

  /** Parsed form of one file that yields TYPED rows directly (HFM
    * setpoint tables, FTIR spectra, Cone scan sheets). `unitKey` is
    * the column-metadata key the single-file loader uses. */
  case class ParsedRows(schema: StructType, rows: Seq[Row],
                        units: Map[String, String], tableMeta: JObj,
                        unitKey: String = "unit")

  /** (path, bytes) → parsed; must be pure + serializable. */
  type Parser = (String, Array[Byte]) => ParsedText
  type RowParser = (String, Array[Byte]) => ParsedRows

  def loadSta(spark: SparkSession, dir: String, glob: String = "*.csv"): DataFrame =
    load(spark, dir, glob, StaSource.parseBytes)

  def loadMcc(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame =
    load(spark, dir, glob, MccSource.parseBytes)

  def loadHfm(spark: SparkSession, dir: String, glob: String = "*.tst"): DataFrame =
    loadTyped(spark, dir, glob, HfmSource.parseRows,
      fixedSchema = Some(HfmSource.FleetSchema))

  /** FTIR column sets vary per instrument configuration; `union=true`
    * runs a distributed schema survey first so every file's spectra
    * land (absent columns null) instead of pinning the head file's. */
  def loadFtir(spark: SparkSession, dir: String, glob: String = "*.[0-9]*",
               union: Boolean = false): DataFrame =
    loadTyped(spark, dir, glob, FtirSource.parseRows,
      fixedSchema = if (union) Some(surveySchema(spark, dir, glob, FtirSource.parseRows))
      else None)

  /** Distributed schema survey: every file parsed in its own task,
    * schemas unioned in first-seen column order. Shared column names
    * must agree on type (it is an error otherwise — that is two
    * instrument families in one directory). */
  def surveySchema(spark: SparkSession, dir: String, glob: String,
                   parser: RowParser): StructType = {
    val paths = list(spark, dir, glob)
    require(paths.nonEmpty, s"no files matching $glob under $dir")
    val ddls = spark.createDataset(paths)(Encoders.STRING)
      .repartition(taskCount(spark, paths.size)) // round-robin files over tasks
      .map { p: String => parser(p, readBytesTask(p)).schema.json }(Encoders.STRING)
      .collect()
    val fields = scala.collection.mutable.LinkedHashMap[String, StructField]()
    ddls.map(j => DataType.fromJson(j).asInstanceOf[StructType]).foreach(_.fields.foreach { f =>
      fields.get(f.name) match {
        case Some(prev) if prev.dataType != f.dataType =>
          throw new IllegalArgumentException(
            s"surveySchema: column '${f.name}' has conflicting types " +
              s"${prev.dataType.catalogString} vs ${f.dataType.catalogString}")
        case Some(_) => ()
        case None => fields(f.name) = f
      }
    })
    StructType(fields.values.toSeq)
  }

  def loadCone(spark: SparkSession, dir: String, glob: String = "*.XLSM"): DataFrame =
    loadTyped(spark, dir, glob, ConeSource.parseRows(_, _))

  def staMetadata(spark: SparkSession, dir: String, glob: String = "*.csv"): DataFrame =
    metadataTable(spark, dir, glob,
      (p, b) => StaSource.parseBytes(p, b).tableMeta)

  def mccMetadata(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame =
    metadataTable(spark, dir, glob,
      (p, b) => MccSource.parseBytes(p, b).tableMeta)

  def hfmMetadata(spark: SparkSession, dir: String, glob: String = "*.tst"): DataFrame =
    metadataTable(spark, dir, glob,
      (p, b) => HfmSource.parseRows(p, b).tableMeta)

  def ftirMetadata(spark: SparkSession, dir: String, glob: String = "*.[0-9]*"): DataFrame =
    metadataTable(spark, dir, glob,
      (p, b) => FtirSource.parseRows(p, b).tableMeta)

  def coneMetadata(spark: SparkSession, dir: String, glob: String = "*.XLSM"): DataFrame =
    metadataTable(spark, dir, glob,
      (p, b) => ConeSource.parseRows(p, b).tableMeta)

  /** Task count for a fleet of n files: one file per task up to 8×
    * the cluster's parallelism, then multiple files per task — a
    * million KB-sized files should not schedule a million tasks. */
  private def taskCount(spark: SparkSession, nFiles: Int): Int =
    math.min(nFiles, 8 * spark.sparkContext.defaultParallelism)

  /** Distributed body ingest: schema = `source_file` + the head
    * file's single-file-loader schema; one executor task per file
    * (bounded by [[taskCount]] for very large fleets). */
  def load(spark: SparkSession, dir: String, glob: String,
           parser: Parser): DataFrame = {
    val paths = list(spark, dir, glob)
    require(paths.nonEmpty, s"no files matching $glob under $dir")
    val head = parser(paths.head, readBytes(spark, paths.head))
    // Pin types with the same CSV inference the single-file path uses.
    val headDf = LabTable.csvBody(spark, head.body, head.delim, head.cols)
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        headDf.schema.fields.toSeq)
    val targets: Seq[(String, DataType)] =
      headDf.schema.fields.toSeq.map(f => (f.name, f.dataType))
    val rows = spark.createDataset(paths)(Encoders.STRING)
      .repartition(taskCount(spark, paths.size)) // round-robin files over tasks
      .mapPartitions { it: Iterator[String] =>
        it.flatMap { p =>
          val parsed = parser(p, readBytesTask(p))
          val srcIdx = targets.map { case (name, dt) =>
            (parsed.cols.indexOf(name), dt)
          }
          parsed.body.iterator.map { line =>
            val fields = line.split(parsed.delim.toString, -1)
            Row.fromSeq(p +: srcIdx.map { case (i, dt) =>
              if (i < 0 || i >= fields.length) null
              else convert(fields(i).trim, dt)
            })
          }
        }
      }(Encoders.row(schema))
    LabTable.withUnits(rows.toDF(),
      head.cols.zip(head.units).map { case (c, u) => (c, u) })
  }

  /** Distributed typed-rows ingest (formats whose parsers emit typed
    * rows directly): schema = `source_file` + the head file's schema
    * (or `fixedSchema`, e.g. a static union of known variants);
    * reconciliation is by column name, one executor task per file.
    * Files must agree on the TYPE of any shared column name (one
    * instrument family per load, like the single-file path). */
  def loadTyped(spark: SparkSession, dir: String, glob: String,
                parser: RowParser,
                fixedSchema: Option[StructType] = None): DataFrame = {
    val paths = list(spark, dir, glob)
    require(paths.nonEmpty, s"no files matching $glob under $dir")
    val head = parser(paths.head, readBytes(spark, paths.head))
    val target = fixedSchema.getOrElse(head.schema)
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        target.fields.toSeq)
    val targetNames = target.fieldNames.toSeq
    val rows = spark.createDataset(paths)(Encoders.STRING)
      .repartition(taskCount(spark, paths.size)) // round-robin files over tasks
      .mapPartitions { it: Iterator[String] =>
        it.flatMap { p =>
          val parsed = parser(p, readBytesTask(p))
          val idx = targetNames.map(n => parsed.schema.fieldNames.indexOf(n))
          parsed.rows.iterator.map { r =>
            Row.fromSeq(p +: idx.map(i => if (i < 0) null else r.get(i)))
          }
        }
      }(Encoders.row(schema))
    val unitMeta = head.units
    rows.toDF().select(rows.toDF().columns.map { c =>
      unitMeta.get(c) match {
        case Some(u) => org.apache.spark.sql.functions.col(c)
          .as(c, new org.apache.spark.sql.types.MetadataBuilder()
            .putString(head.unitKey, u).build())
        case None => org.apache.spark.sql.functions.col(c)
      }
    }.toSeq: _*)
  }

  /** One row per file: (source_file, type, file_metadata JSON) —
    * the table-level metadata the single-file loader carries on
    * [[LabTable]], in queryable frame form. */
  def metadataTable(spark: SparkSession, dir: String, glob: String,
                    parser: (String, Array[Byte]) => JObj): DataFrame = {
    val paths = list(spark, dir, glob)
    require(paths.nonEmpty, s"no files matching $glob under $dir")
    val schema = StructType(Seq(
      StructField("source_file", StringType, nullable = false),
      StructField("type", StringType),
      StructField("file_metadata", StringType)))
    spark.createDataset(paths)(Encoders.STRING)
      .repartition(taskCount(spark, paths.size)) // round-robin files over tasks
      .mapPartitions { it: Iterator[String] =>
        it.map { p =>
          val tableMeta = parser(p, readBytesTask(p))
          val tpe = tableMeta.get("type")
            .collect { case JStr(s) => s }.orNull
          val fm = tableMeta.get("file_metadata").map(_.render).orNull
          Row(p, tpe, fm)
        }
      }(Encoders.row(schema))
      .toDF()
  }

  /** Numeric conversion matching the pinned CSV-inferred schema;
    * unparseable cells become null (permissive, as Spark CSV). */
  private def convert(s: String, dt: DataType): Any =
    try dt match {
      case LongType => java.lang.Long.parseLong(s)
      case DoubleType => java.lang.Double.parseDouble(s)
      case _ => s
    } catch { case _: NumberFormatException => null }

  private def list(spark: SparkSession, dir: String, glob: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val found = fs.globStatus(hPath)
    if (found == null) Seq.empty
    else found.toSeq.filter(_.isFile).map(_.getPath.toString).sorted
  }

  private def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readAll(fs, hPath)
  }

  /** Executor-side read: tasks build a default Hadoop conf (picks up
    * core-site.xml on the executor classpath — the standard cluster
    * distribution mechanism for FS credentials). */
  private def readBytesTask(path: String): Array[Byte] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    readAll(fs, hPath)
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }
}
