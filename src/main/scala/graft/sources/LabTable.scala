package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, MetadataBuilder}
import graft.functions.{JObj, JStr, JVal}

/** The engine's fundamental abstraction (SURVEY.md §1.1): a DataFrame
  * whose StructField metadata carries per-column units and whose
  * table-level `file_metadata`/`type` JSON rides alongside.
  *
  * Column metadata survives Spark's parquet round-trip (it is embedded
  * in the `org.apache.spark.sql.parquet.row.metadata` footer key);
  * table-level metadata has no first-class Spark slot, so the sink
  * writes it as a `_lab_metadata.json` sidecar in the output directory
  * (and `read` restores it).
  */
case class LabTable(df: DataFrame, tableMeta: JObj) {

  def typeTag: Option[String] = tableMeta.get("type").collect { case JStr(s) => s }
  def fileMetadata: Option[JVal] = tableMeta.get("file_metadata")

  def unitOf(column: String): Option[String] = {
    val m = df.schema(column).metadata
    if (m.contains("unit") && m.getString("unit") != null) Option(m.getString("unit"))
    else None
  }

  /** Parquet sink, snappy (SURVEY.md §2.11 K1). Table-level metadata
    * lands in BOTH interop slots: the parquet footer key-value
    * entries `file_metadata`/`type` (byte-matching the reference's
    * pyarrow footer layout, util.py:56-71 — a footer-key consumer
    * sees identical JSON) and a `_lab_metadata.json` sidecar (useful
    * for humans and directory listings). */
  def write(path: String): Unit = {
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)
    val footerEntries =
      fileMetadata.map(m => "file_metadata" -> m.render).toSeq ++
        typeTag.map(t => "type" -> t).toSeq
    if (footerEntries.nonEmpty) {
      val parts = new java.io.File(path).listFiles()
      if (parts != null)
        parts.filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .foreach { f =>
            ParquetFooter.addKeyValue(f.getPath, footerEntries)
            // the in-place edit invalidates Hadoop's local-FS .crc
            // sidecar; drop it so ChecksumFileSystem re-reads cleanly
            val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
            if (crc.exists()) crc.delete()
          }
      // The surgery grows each file; drop Spark's cached FileStatus
      // (a stale length makes the footer reader seek out of bounds).
      df.sparkSession.catalog.refreshByPath(path)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_lab_metadata.json"), tableMeta.render)
  }
}

object LabTable {

  def read(spark: SparkSession, path: String): LabTable = {
    val df = spark.read.parquet(path)
    // Footer keys first (present in our output AND the reference's
    // pyarrow-written files); sidecar as fallback.
    val fromFooter: Option[JObj] = {
      val parts = new java.io.File(path).listFiles()
      val part = Option(parts).toSeq.flatten
        .find(f => f.isFile && f.getName.endsWith(".parquet"))
      part.flatMap { f =>
        val kv = ParquetFooter.readKeyValue(f.getPath)
        if (!kv.contains("file_metadata") && !kv.contains("type")) None
        else Some(JObj(Vector.empty) ++?
          kv.get("file_metadata").map(s => "file_metadata" -> PyJsonParser.parse(s)) ++?
          kv.get("type").map(s => "type" -> (JStr(s): JVal)))
      }
    }
    val sidecar = java.nio.file.Paths.get(path, "_lab_metadata.json")
    val meta = fromFooter.getOrElse {
      if (java.nio.file.Files.exists(sidecar))
        PyJsonParser.parse(java.nio.file.Files.readString(sidecar)) match {
          case o: JObj => o
          case other => JVal.obj("file_metadata" -> other)
        }
      else JObj(Vector.empty)
    }
    LabTable(df, meta)
  }

  private implicit class JObjBuild(o: JObj) {
    def ++?(kv: Option[(String, JVal)]): JObj =
      kv.map(o + _).getOrElse(o)
  }

  /** Attach per-column unit metadata (reference: util.py:37-54; a
    * missing unit is JSON null there, mirrored as a null entry). */
  def withUnits(df: DataFrame, colUnits: Seq[(String, Option[String])]): DataFrame = {
    val m = colUnits.toMap
    df.select(df.columns.map { c =>
      val mb = new MetadataBuilder()
      m.getOrElse(c, None) match {
        case Some(u) => mb.putString("unit", u)
        case None => mb.putNull("unit")
      }
      col(c).as(c, mb.build())
    }.toSeq: _*)
  }

  /** Parse delimiter-separated body lines into a typed DataFrame:
    * distributed CSV parse + schema inference over a Dataset[String]
    * (the driver only holds the small raw lines of one instrument
    * file; a directory-of-files scale path would hand the same
    * parse to binaryFile + flatMap). Integral columns are widened to
    * long — the reference's Arrow inference emits int64. */
  def csvBody(spark: SparkSession, lines: Seq[String], delim: Char,
              cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds = spark.createDataset(lines)
    val df = spark.read
      .option("delimiter", delim.toString)
      .option("inferSchema", "true")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(ds)
      .toDF(cols: _*)
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType => col(f.name).cast("long").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }
}
